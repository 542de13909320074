"""Deterministic sentence splitter / tokenizer / dependency parser.

Emits the reference's ``parsed_result`` row shape
(/root/reference/aser/extract/utils.py:234-277): tokens, lemmas, pos_tags,
ners + mention spans (deterministic gazetteer NER over the reference's
TYPE_SET classes), and enhanced-dependency-style edges, 0-based and
sorted by (governor, dependent) exactly like utils.py:244-245.

Grammar covered (the synthetic transcript corpus stays inside it):
  clause  := [subject-NP] verb-group predicate*
  subject := (DT|PRP$|JJ|CD|NN)* (NN|NNS|PRP)  |  EX
  verb-group := (MD | be | have | do | not)* [content-verb]
  predicate  := NP (dobj / iobj+dobj) | JJ (xcomp) | TO-VP (xcomp)
              | TO-be-JJ (xcomp+cop) | IN NP (case + nmod:<prep>) | RB (advmod)
  copular := be + (JJ | NP) -> predicate governs (cop/nsubj), CoreNLP-style
  existential := EX be NP -> expl + nsubj on the be-verb
  sentence := clause ((CC | SUBORD) clause)*   with conj:<cc> / advcl:<sub>
              links and enhanced-style subject propagation into
              shared-subject VP conjuncts.
"""

from __future__ import annotations

import re

from .lexicon import (COORDINATORS, LAST_RESORT_VERB_FORMS, SUBORDINATORS,
                      tag_and_lemma)

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_TOKEN = re.compile(r"[A-Za-z']+(?:-[A-Za-z']+)*|\d+(?:\.\d+)?|[.,!?;:]")

_NOUNISH = ("NN", "NNS", "NNP", "NNPS")
_PARTICLES = frozenset(("out", "off", "up", "down", "away", "over", "around"))
_TEMPORAL_NOUNS = frozenset((
    "morning", "afternoon", "evening", "night", "week", "year", "month",
    "day", "weekend", "hour", "minute", "summer", "winter", "spring",
    "autumn", "season",
))
_NP_INNER = ("DT", "PRP$", "JJ", "CD", "NN", "NNS", "NNP")

# verbs that govern a bare-infinitive complement ("help wash dishes",
# "let it rest") — exempt from the VB+VB compound-noun demotion
_CATENATIVE = frozenset(
    "help let make watch see hear feel go come have do dare".split())
_BE_TAGS = ("VB", "VBP", "VBZ", "VBD", "VBN", "VBG")

# Deterministic NER gazetteer (stands in for CoreNLP's ner annotator over
# the synthetic corpus).  Classes come from the reference's TYPE_SET
# (utils.py:12) — the set its mention builder keeps.  Capitalized
# occurrences tag NNP with the SURFACE form as lemma (CoreNLP's NNP
# lemmatization) and the class in ``ners``; maximal same-class runs become
# mention dicts shaped like utils.py:259-269.
NER_GAZETTEER = {
    "alice": "PERSON", "bob": "PERSON", "carol": "PERSON", "dave": "PERSON",
    "erin": "PERSON", "frank": "PERSON", "grace": "PERSON", "heidi": "PERSON",
    "paris": "CITY", "london": "CITY", "tokyo": "CITY", "boston": "CITY",
    "acme": "ORGANIZATION", "globex": "ORGANIZATION",
    "initech": "ORGANIZATION", "corp": "ORGANIZATION",
}


def _ner_spans(tokens, tags):
    """(ners, mentions) from the gazetteer over NNP-tagged tokens."""
    n = len(tokens)
    ners = [
        NER_GAZETTEER.get(tok.lower(), "O") if tag == "NNP" else "O"
        for tok, tag in zip(tokens, tags)
    ]
    mentions = []
    i = 0
    while i < n:
        if ners[i] == "O":
            i += 1
            continue
        j = i
        while j + 1 < n and ners[j + 1] == ners[i]:
            j += 1
        mentions.append({
            "start": i, "end": j + 1,
            "text": " ".join(tokens[i:j + 1]),
            "ner": ners[i], "link": None, "entity": None,
        })
        i = j + 1
    return ners, mentions


def split_sentences(text: str):
    return [s for s in (_SENT_SPLIT.split(text.strip()) if text else []) if s]


_CONTRACTION = re.compile(r"^([A-Za-z]+)('m|'s|'re|'ll|'ve|'d)$", re.IGNORECASE)
_NT = re.compile(r"^([A-Za-z]+?)(n't)$", re.IGNORECASE)


def tokenize(sentence: str):
    """CoreNLP-style tokens: contractions split off their host
    (I'm -> I + 'm, can't -> ca + n't)."""
    out = []
    for t in _TOKEN.findall(sentence):
        if "'" in t:  # both contraction patterns require an apostrophe
            m = _CONTRACTION.match(t)
            if m:
                out.extend([m.group(1), m.group(2)])
                continue
            m = _NT.match(t)
            if m and m.group(1).lower() not in ("n", ""):
                out.extend([m.group(1), m.group(2)])
                continue
        out.append(t)
    return out


def _is_verb(tag):
    return tag.startswith("VB") or tag == "MD"


# nominal gerunds that form noun compounds ("training sessions",
# "parking passes") — the only VBG+noun sequences read nominally; other
# VBG+noun stays a gerund VP ("leaving town", "eating apples")
_NOMINAL_GERUNDS = frozenset((
    "training", "monitoring", "parking", "housing", "clothing",
    "planting", "sampling", "closing", "flooding", "tracking",
    "funding",
))
_ORDINAL_JJ = frozenset((
    "second", "third", "fourth", "fifth", "sixth", "seventh", "eighth",
    "ninth", "tenth",
))
_TEMPORAL_JJ = frozenset((
    "daily", "weekly", "monthly", "yearly", "hourly", "nightly",
))
_AMBIG_JJ_ADV = frozenset(("early", "late", "earlier", "later"))

# hoisted tuple unions (the _retag loop previously re-built these per token)
_NP_INNER_PLUS_PL = _NP_INNER + ("NNS", "NNPS")
_PREV_GERUND = ("IN", "DT", "PRP$", "JJ") + _NOUNISH
_PREV_COMPOUND = ("JJ",) + _NOUNISH
_PREV_MODAL_NOUN = ("DT", "PRP$", "JJ", "CD") + _NOUNISH
_SUBJ_TAGS = _NOUNISH + ("PRP", "CD")


def _retag(tokens, tags, lemmas):
    """Context fixes: her PRP$->PRP before verbs/end, ambiguous VBD->VBN
    after a be/have auxiliary (passive / perfect participles), possessive
    's, nominal gerunds, adverb/adjective flips (r6 held-out growth)."""
    n = len(tokens)

    def _aux_before(i):
        j = i - 1
        while j >= 0 and tags[j] == "RB":
            j -= 1
        return j >= 0 and (
            tags[j] in ("MD", "TO")
            or (lemmas[j] in ("be", "have") and tags[j].startswith("VB"))
        )

    for i in range(n):
        w = tokens[i].lower()
        nxt = tags[i + 1] if i + 1 < n else "."
        nxt2 = tags[i + 2] if i + 2 < n else "."
        prv = tags[i - 1] if i > 0 else None
        if w == "'s" and lemmas[i] == "be" and prv in _NOUNISH and (
            nxt in _NOUNISH or (nxt in ("JJ", "CD") and nxt2 in _NOUNISH)
        ):
            # possessive clitic ("the city 's laws"), not is-contraction
            tags[i], lemmas[i] = "POS", "'s"
            continue
        if tags[i] == "RB" and nxt in _NOUNISH and (
            prv in ("DT", "PRP$") or w in _AMBIG_JJ_ADV
        ):
            # attributive reading of an adverb-default word ("a late fee",
            # "its first keeper", "earlier varieties")
            tags[i], lemmas[i] = "JJ", w
            continue
        if tags[i] == "JJ" and prv == "DT" and (
            nxt == "TO" or (w in _ORDINAL_JJ
                            and nxt not in _NP_INNER_PLUS_PL)
        ):
            # nominal reading: "the right to install", "by the fifth."
            tags[i], lemmas[i] = "NN", w
            continue
        if tags[i] == "JJ" and w in _TEMPORAL_JJ and i > 0 \
                and nxt in (".", ",", "!", "?", ";", ":") \
                and prv not in ("DT", "PRP$", "JJ", "CD"):
            # clause-final frequency adverbial ("record the retreat weekly")
            tags[i], lemmas[i] = "RB", w
            continue
        if tags[i] == "VBG" and lemmas[i] != "be" and not _aux_before(i):
            # nominal gerund contexts (CoreNLP tags these NN):
            #   sentence-initial before the finite verb ("Closing occurred")
            #   after IN/DT/PRP$/JJ/noun with no NP following ("in writing",
            #   "their filing", "a public hearing", "aerosol sampling")
            #   compound head position for the closed list ("training
            #   sessions", "parking passes")
            if (i == 0 and nxt in ("VBZ", "VBD", "VBP", "MD", "RB", "IN")) \
               or (prv in _PREV_GERUND
                   and nxt in ("IN", "RB", "VBZ", "VBD", "VBP", "MD",
                               "POS", ".", ",", "!", "?", ";", ":")) \
               or ((i == 0 or prv in _PREV_COMPOUND) and nxt in _NOUNISH
                   and w in _NOMINAL_GERUNDS):
                tags[i] = "NN"
                lemmas[i] = w
                continue
        if tags[i] in ("NN", "NNS") and prv == "PRP" and (
            i < 2 or not (tags[i - 2].startswith("VB")
                          or tags[i - 2] in ("MD", "TO"))
        ) and nxt in ("PRP", "DT", "PRP$", "CD", "JJ") + _NOUNISH:
            # noun-default word as the verb of a pronoun subject
            # ("I water it", "we report agreement"); the i-2 guard keeps
            # double-object frames intact ("give me coffee")
            tags[i] = "VBZ" if tags[i] == "NNS" else "VBP"
            continue
        if tags[i] == "VBZ" and i == 0 and nxt == "IN":
            # sentence-initial plural noun misread as 3sg verb
            # ("Returns from your region ... complete faster")
            tags[i] = "NNS"
            continue
        if tags[i] == "MD" and w in ("can", "will") \
                and prv in _PREV_MODAL_NOUN:
            # a modal must govern a verb phrase; when nothing verbal can
            # follow (next non-adverb is a preposition/punct/conjunction),
            # the noun reading wins ("a tuna can by the sprinkler",
            # "the will was read")
            j = i + 1
            while j < n and tags[j] == "RB":
                j += 1
            if j >= n or tags[j] in ("IN", ".", ",", ";", ":", "CC", "POS"):
                tags[i] = "NN" if w == "will" or prv != "NNS" else "NNS"
                lemmas[i] = w
                continue
        if tags[i] == "VB" and prv in ("VB", "VBP", "VBZ", "VBD") \
                and lemmas[i - 1] not in _CATENATIVE \
                and i + 1 < n and tags[i + 1] in _NOUNISH:
            # noun/verb-ambiguous bare form between a non-catenative verb
            # and a noun is a compound modifier ("choose paint colors");
            # catenative governors keep the verb chain ("help wash dishes")
            tags[i], lemmas[i] = "NN", w
            continue
        if w == "once" and tags[i] == "IN" and not any(
            _is_verb(tags[j]) for j in range(i + 1, n)
        ):
            # frequency adverb, not subordinator ("once a month")
            tags[i], lemmas[i] = "RB", w
            continue
        if w == "forward" and tags[i] == "RB" and _aux_before(i) \
                and nxt in ("DT", "PRP$", "PRP"):
            # verb reading after a modal ("I will forward the details")
            tags[i], lemmas[i] = "VB", w
            continue
        if tags[i] in ("NN", "NNS") and prv in _NOUNISH \
                and (nxt in ("DT", "PRP$", "PRP")
                     or (nxt == "TO" and nxt2 in ("VB", "VBP"))) \
                and i + 1 < n:
            # noun-default word as the verb of a noun subject
            # ("Farmers watch the forecast", "The mural depicts the town")
            tags[i] = "VBZ" if tags[i] == "NNS" else "VBP"
            continue
        if tags[i] == "NN" and i == 0 and nxt in ("DT", "PRP$") \
                and not any(_is_verb(t) for t in tags[1:]):
            # otherwise-verbless sentence opening with a noun-default word
            # before an NP is an imperative ("Report any damaged equipment")
            tags[i], lemmas[i] = "VB", w
            continue
        if w == "her":
            nxt = tags[i + 1] if i + 1 < n else "."
            if nxt not in _NP_INNER:
                tags[i], lemmas[i] = "PRP", "she"
        elif w == "that":
            nxt = tags[i + 1] if i + 1 < n else "."
            # demonstrative: subject position ("that is...") or determiner
            # directly before a bare noun ("that sound", "that morning")
            if nxt.startswith("VB") or nxt == "MD" or nxt in ("NN", "NNS", "JJ"):
                tags[i], lemmas[i] = "DT", "that"
        elif tags[i] in ("VBD", "VBN", "VBG"):
            # VBD immediately after a be/have auxiliary (skipping adverbs)
            # reads as a participle — lexicon ambi-forms AND out-of-
            # vocabulary regular "-ed" verbs alike ("the wall was chalked")
            j = i - 1
            while j >= 0 and tags[j] == "RB":
                j -= 1
            if tags[i] == "VBD" and j >= 0 and lemmas[j] in ("be", "have") \
                    and tags[j].startswith("VB"):
                tags[i] = "VBN"
            elif (i == 0 or tags[i - 1] in ("DT", "PRP$", "CD", "JJ", "IN")
                  or (tags[i] != "VBN" and tags[i - 1] in ("VBZ", "VBP"))) \
                    and i + 1 < n and (tags[i + 1] in _NOUNISH
                                       or tags[i + 1] == "VBZ"
                                       or (tags[i + 1] == "VBG" and i + 2 < n
                                           and tags[i + 2] in _NOUNISH)
                                       or (i == 0 and tags[i + 1]
                                           in ("VB", "VBP"))):
                # attributive participle opening an NP chunk ("a restored
                # mural", "of staggered planting dates", "Double-sided
                # tape worked") -> adjective reading
                tags[i] = "JJ"
        elif tags[i] == "VBZ" and lemmas[i] not in ("be", "have", "do") \
                and i + 1 < n and tags[i + 1] in ("MD", "VB", "VBP", "VBZ"):
            # plural noun misread as 3sg verb directly before the real
            # verb group ("Counts will continue", "Denied calls return")
            tags[i] = "NNS"  # lemma stays the singular (= verb lemma)
        elif tags[i] in ("VB", "VBP") and i == 0 and i + 1 < n \
                and tags[i + 1] in ("VBD", "VBZ", "MD") \
                and lemmas[i] not in ("be", "have", "do"):
            # sentence-initial noun/verb-ambiguous word directly before a
            # finite verb is the subject ("Rain delayed the third set")
            tags[i], lemmas[i] = "NN", w
        elif tags[i] in ("VB", "VBP", "VBZ") and i > 0 and tags[i - 1] in (
            "DT", "PRP$", "JJ", "CD"
        ) and lemmas[i] not in ("be", "have", "do") and not (
            tags[i] == "VBZ"
            and tokens[i - 1].lower() in ("this", "that", "these", "those")
            and (i + 1 >= n or tags[i + 1] not in _NP_INNER)
        ) and not (
            # a 3sg verb after a CD subject head and directly before a new
            # NP is the predicate, not an NP-internal noun ("Each one takes
            # a winter") — a noun could not be followed by a determiner
            tags[i] == "VBZ" and tags[i - 1] == "CD"
            and i + 1 < n and tags[i + 1] in ("DT", "PRP$", "PRP")
        ):
            # noun/verb-ambiguous word inside an NP chunk ("the test",
            # "a review", "the reports") -> noun reading
            if tags[i] == "VBZ":
                tags[i] = "NNS"  # lemma stays the singular (= verb lemma)
            else:
                tags[i], lemmas[i] = "NN", w
        elif tags[i] in ("NN", "NNS", "JJ") and i > 0:
            # base verb after an auxiliary chain ("did not portray",
            # "did not cross", "did not light", "will persist"): the
            # suffix fallback reads suffixless unknowns as NN/NNS and the
            # lexicon may know the word as an adjective; an MD / do / TO
            # governor (skipping adverbs) forces the VB reading
            j = i - 1
            while j >= 0 and tags[j] == "RB":
                j -= 1
            if j >= 0 and (
                tags[j] == "MD"
                or (tags[j] == "TO"
                    and (j == 0 or tags[j - 1] not in _NOUNISH))
                # a TO right after a noun is prepositional ("a gradual
                # return to tennis", "the letter to investors") — only a
                # non-nominal governor marks the infinitive reading
                or (lemmas[j] == "do" and tags[j].startswith("VB"))
            ):
                tags[i], lemmas[i] = "VB", w

    # Last-resort finite-verb promotion: if the sentence still has NO
    # verbal tag, promote the first noun/adjective-tagged token with a
    # known verb reading (including NOUNS-guarded forms like "shops" and
    # the promote-only lemmas — lexicon.LAST_RESORT_VERB_FORMS).  Firing
    # only on otherwise-verbless sentences makes the pass collision-safe
    # by construction: no sentence that parses today can be touched.
    # ("He still shops the market", "Eleven of them coach today",
    # "Water in the morning rather than the evening." — held-out #3, r6)
    if not any(_is_verb(t) for t in tags):
        for i in range(n):
            if tags[i] not in ("NN", "NNS", "JJ"):
                continue
            entry = LAST_RESORT_VERB_FORMS.get(tokens[i].lower())
            if entry is None:
                continue
            tag, lemma = entry
            has_subj = any(tags[j] in _SUBJ_TAGS
                           for j in range(i))
            if has_subj:
                # a base form after a subject is a plural-agreement finite
                # verb ("they bloom"); -s/-ed forms keep their lexicon tag
                tags[i] = "VBP" if tag == "VB" else tag
            elif i == 0 and tag == "VB":
                tags[i] = "VB"  # imperative opening ("Water the bed")
            else:
                continue
            lemmas[i] = lemma
            break


def _split_clauses(tags, lemmas):
    """Return list of (marker_idx | None, kind, [token indices]) where kind
    is '' (main), 'sub' (advcl) or 'cc' (conj).  Commas/periods excluded.

    O(n): the original per-token ``any(_is_verb ...)`` scans made this
    quadratic; a suffix verb table plus two running flags give identical
    decisions in one pass."""
    n = len(tags)
    clauses = []
    cur, marker, kind = [], None, ""
    cur_has_verb = False
    # verb_after[i] == any(_is_verb(tags[j]) for j in range(i, n))
    verb_after = [False] * (n + 1)
    for j in range(n - 1, -1, -1):
        verb_after[j] = verb_after[j + 1] or _is_verb(tags[j])
    seen_verb = False  # any verb at an index < i

    def flush():
        nonlocal cur, marker, kind, cur_has_verb
        if cur:
            clauses.append((marker, kind, cur))
        cur, marker, kind = [], None, ""
        cur_has_verb = False

    for i in range(n):
        tag, lem = tags[i], lemmas[i]
        if tag in (".", ",", "!", "?", ":", ";"):
            # a comma/semicolon between two verbal clauses is a clause
            # boundary (parataxis): "because the cat slept, the dog barked"
            if tag in (",", ";", ":") and cur_has_verb and verb_after[i + 1]:
                flush()
            continue
        if tag == "IN" and lem in SUBORDINATORS and verb_after[i + 1]:
            flush()
            marker, kind = i, "sub"
        elif tag == "CC" and lem in COORDINATORS and verb_after[i + 1] \
                and seen_verb:
            flush()
            marker, kind = i, "cc"
        else:
            cur.append(i)
            if _is_verb(tag):
                cur_has_verb = True
        if _is_verb(tag):
            seen_verb = True
    flush()
    return clauses


def _np_chunk_edges(idxs, tags, lemmas, deps):
    """Attach NP-internal edges; return head index (last nounish/PRP)."""
    head = None
    for i in idxs:
        if tags[i] in _NOUNISH or tags[i] == "PRP":
            head = i
    if head is None:
        head = idxs[-1]
    for i in idxs:
        if i == head:
            continue
        t = tags[i]
        if t == "DT":
            deps.append((head, "det", i))
        elif t == "PRP$":
            deps.append((head, "nmod:poss", i))
        elif t == "JJ":
            deps.append((head, "amod", i))
        elif t == "CD":
            deps.append((head, "nummod", i))
        elif t in _NOUNISH:
            deps.append((head, "compound", i))
        elif t == "RB":
            deps.append((head, "advmod", i))
    return head


def _collect_np(seq, tags, start):
    """Longest NP run in ``seq`` (list of token idx) starting at offset
    ``start``; returns (chunk_indices, next_offset) or (None, start)."""
    j = start
    chunk = []
    while j < len(seq) and tags[seq[j]] in _NP_INNER or (
        j == start and j < len(seq) and tags[seq[j]] == "PRP"
    ):
        t = tags[seq[j]]
        chunk.append(seq[j])
        j += 1
        if t in ("NN", "NNS", "NNP", "PRP"):
            # head reached -> chunk ends, except a compound-noun run
            # continues to its last noun ("the border station")
            if t != "PRP" and j < len(seq) and tags[seq[j]] in _NOUNISH:
                continue
            break
    if not chunk or tags[chunk[-1]] not in _NOUNISH + ("PRP",):
        return None, start
    return chunk, j


def _flush_objects(verb, np_slots, deps):
    if len(np_slots) == 1:
        deps.append((verb, "dobj", np_slots[0]))
    elif len(np_slots) >= 2:
        deps.append((verb, "iobj", np_slots[0]))
        deps.append((verb, "dobj", np_slots[1]))
        for extra in np_slots[2:]:
            deps.append((verb, "dep", extra))


def _parse_vp(verb, seq, tags, lemmas, deps):
    """Post-verbal attachments for content verb ``verb`` over remaining
    token indices ``seq`` (in order)."""
    k = 0
    np_slots = []  # noun chunk heads, in order -> dobj / iobj+dobj
    while k < len(seq):
        i = seq[k]
        t, lem = tags[i], lemmas[i]
        if t == "TO" and k + 1 < len(seq):
            _flush_objects(verb, np_slots, deps)  # "asked him to ..." -> dobj(him)
            sub = seq[k + 1:]
            # to be JJ/NP -> xcomp with copula; to VB ... -> xcomp VP
            if lemmas[sub[0]] == "be" and len(sub) > 1:
                pred = sub[1]
                if tags[pred] == "JJ":
                    deps.append((verb, "xcomp", pred))
                    deps.append((pred, "mark", i))
                    deps.append((pred, "cop", sub[0]))
                    _parse_vp(pred, sub[2:], tags, lemmas, deps)
                else:
                    chunk, nxt = _collect_np(sub[1:], tags, 0)
                    if chunk:
                        head = _np_chunk_edges(chunk, tags, lemmas, deps)
                        deps.append((verb, "xcomp", head))
                        deps.append((head, "mark", i))
                        deps.append((head, "cop", sub[0]))
            elif tags[sub[0]].startswith("VB"):
                xv = sub[0]
                deps.append((verb, "xcomp", xv))
                deps.append((xv, "mark", i))
                _parse_vp(xv, sub[1:], tags, lemmas, deps)
            return  # infinitive consumes the rest
        if t == "IN":
            chunk, nxt = _collect_np(seq, tags, k + 1)
            if chunk:
                head = _np_chunk_edges(chunk, tags, lemmas, deps)
                deps.append((head, "case", i))
                deps.append((verb, "nmod:" + lem, head))
                k = nxt
                continue
            if lem in _PARTICLES:
                # verb particle with no object NP ("went out", "taper
                # off") -> compound:prt, CoreNLP-style
                deps.append((verb, "compound:prt", i))
            k += 1
            continue
        if t == "RB":
            deps.append((verb, "neg" if lem == "not" else "advmod", i))
            k += 1
            continue
        if t == "JJ":
            nxt_t = tags[seq[k + 1]] if k + 1 < len(seq) else "."
            if nxt_t in _NP_INNER:  # adjective opens an NP chunk
                chunk, nxt = _collect_np(seq, tags, k)
                if chunk:
                    np_slots.append(_np_chunk_edges(chunk, tags, lemmas, deps))
                    k = nxt
                    continue
            deps.append((verb, "xcomp", i))  # "feels happy"
            k += 1
            continue
        if t == "CC" and np_slots and k + 1 < len(seq):
            # NP coordination in object position attaches to the previous
            # object head, CoreNLP-style ("added a family room and a
            # second furnace" -> conj:and(room, furnace)), NOT as a second
            # object slot on the verb — the spurious iobj/dobj pair made
            # the reference's rules veto sentences CoreNLP extracts from
            chunk, nxt = _collect_np(seq, tags, k + 1)
            if chunk:
                head = _np_chunk_edges(chunk, tags, lemmas, deps)
                deps.append((np_slots[-1], "cc", i))
                deps.append((np_slots[-1], "conj:" + lem, head))
                k = nxt
                continue
            k += 1
            continue
        chunk, nxt = _collect_np(seq, tags, k)
        if chunk:
            head = _np_chunk_edges(chunk, tags, lemmas, deps)
            first = chunk[0]
            if lemmas[head] in _TEMPORAL_NOUNS and (
                len(chunk) == 1 or lemmas[first] in ("this", "that",
                                                     "every", "each",
                                                     "last", "next")
            ):
                # bare temporal NP ("that morning", "this year") ->
                # nmod:tmod, CoreNLP-style, not a dobj slot
                deps.append((verb, "nmod:tmod", head))
            else:
                np_slots.append(head)
            k = nxt
            continue
        k += 1

    _flush_objects(verb, np_slots, deps)


def _parse_clause(idxs, tags, lemmas, deps, inherited_subject=None):
    """Parse one clause; returns its head token index (or None)."""
    if not idxs:
        return None
    # locate verb group start
    vstart = next((k for k, i in enumerate(idxs) if _is_verb(tags[i])), None)
    if vstart is None:
        # verbless fragment: treat as NP
        return _np_chunk_edges(idxs, tags, lemmas, deps)

    # verb chain: MD/aux/not sequence, ending at last consecutive verbal token
    chain = []
    k = vstart
    while k < len(idxs):
        i = idxs[k]
        if _is_verb(tags[i]) or (tags[i] == "RB" and lemmas[i] == "not"):
            chain.append(i)
            k += 1
        else:
            break
    rest = idxs[k:]
    content = [i for i in chain if tags[i].startswith("VB") and lemmas[i] not in ("be", "have", "do")]
    main = content[-1] if content else None
    be_idx = [i for i in chain if lemmas[i] == "be"]
    if main is None and not be_idx:
        # have/do with nothing after them are content verbs ("the island
        # has one road"), matching CoreNLP's root choice
        have_do = [i for i in chain if lemmas[i] in ("have", "do")
                   and tags[i].startswith("VB")]
        if have_do:
            main = have_do[-1]

    # --- subject region: leading PPs (sentence adverbials) then the NP ---
    pre = idxs[:vstart]
    expl_idx = next((i for i in pre if tags[i] == "EX"), None)
    pending_pps = []  # (prep_idx, np_head) -> nmod on the clause head
    j = 0
    while j < len(pre) and tags[pre[j]] == "IN":
        chunk, nxt = _collect_np(pre, tags, j + 1)
        if not chunk:
            break
        np_head = _np_chunk_edges(chunk, tags, lemmas, deps)
        pending_pps.append((pre[j], np_head))
        j = nxt
    pre = pre[j:]
    subj = None
    if pre and expl_idx is None:
        subj = _np_chunk_edges(pre, tags, lemmas, deps)
    elif inherited_subject is not None:
        subj = inherited_subject

    def _attach_pps(head):
        # SENTENCE-INITIAL PPs ("In the meantime, ...") are scene-setting
        # adverbials: `nmod:npmod` is allowed to DANGLE by the rules'
        # negative lists but never selected (rule.py:383-387), which is how
        # the reference's doc example keeps "i be sure" free of "meantime"
        # (aser_extractor.py:728-738)
        for prep_idx, np_head in pending_pps:
            deps.append((np_head, "case", prep_idx))
            deps.append((head, "nmod:npmod", np_head))

    if main is not None:
        passive = tags[main] == "VBN" and be_idx
        for i in chain:
            if i == main:
                continue
            if lemmas[i] == "not":
                deps.append((main, "neg", i))
            elif lemmas[i] == "be" and passive:
                deps.append((main, "auxpass", i))
            else:
                deps.append((main, "aux", i))
        if expl_idx is not None:
            deps.append((main, "expl", expl_idx))
        if subj is not None:
            deps.append((main, "nsubjpass" if passive else "nsubj", subj))
        _parse_vp(main, rest, tags, lemmas, deps)
        _attach_pps(main)
        return main

    # --- copular / existential: chain is pure be (+aux/not) ---
    be = be_idx[-1] if be_idx else chain[-1]
    if expl_idx is not None:  # there-be-o: the be-verb stays the head
        deps.append((be, "expl", expl_idx))
        chunk, nxt = _collect_np(rest, tags, 0)
        if chunk:
            head = _np_chunk_edges(chunk, tags, lemmas, deps)
            deps.append((be, "nsubj", head))
            _parse_vp(be, rest[nxt:], tags, lemmas, deps) if rest[nxt:] else None
        for i in chain:
            if i != be:
                deps.append((be, "neg" if lemmas[i] == "not" else "aux", i))
        _attach_pps(be)
        return be

    # predicate head: JJ or NP after be
    pred = None
    rest2 = rest
    if rest and tags[rest[0]] == "JJ" and (
        len(rest) == 1 or tags[rest[1]] not in _NP_INNER
    ):
        pred = rest[0]
        rest2 = rest[1:]
    else:
        chunk, nxt = _collect_np(rest, tags, 0)
        if chunk:
            pred = _np_chunk_edges(chunk, tags, lemmas, deps)
            rest2 = rest[nxt:]
    if pred is None:  # bare "it is." fragment
        pred = be
        for i in chain:
            if i != be:
                deps.append((be, "neg" if lemmas[i] == "not" else "aux", i))
        if subj is not None:
            deps.append((be, "nsubj", subj))
        _attach_pps(be)
        return be

    deps.append((pred, "cop", be))
    for i in chain:
        if i == be:
            continue
        deps.append((pred, "neg" if lemmas[i] == "not" else "aux", i))
    if subj is not None:
        deps.append((pred, "nsubj", subj))
    # adjective-complement clause: "i'm sure [we could find ...]" -> the
    # embedded clause parses independently and hangs off the predicate as
    # ccomp (CoreNLP-style); dangling ccomp is in the patterns' allowed set
    if rest2 and any(_is_verb(tags[i]) for i in rest2):
        before_emb = len(deps)
        emb_head = _parse_clause(rest2, tags, lemmas, deps)
        if emb_head is not None and emb_head != pred:
            deps.append((pred, "ccomp", emb_head))
        elif len(deps) == before_emb:
            _parse_vp_mods_only(pred, rest2, tags, lemmas, deps)
    else:
        # post-predicate modifiers (PPs, adverbs) attach to the predicate
        _parse_vp_mods_only(pred, rest2, tags, lemmas, deps)
    _attach_pps(pred)
    return pred


def _parse_vp_mods_only(head, seq, tags, lemmas, deps):
    k = 0
    while k < len(seq):
        i = seq[k]
        if tags[i] == "IN":
            chunk, nxt = _collect_np(seq, tags, k + 1)
            if chunk:
                nhead = _np_chunk_edges(chunk, tags, lemmas, deps)
                deps.append((nhead, "case", i))
                deps.append((head, "nmod:" + lemmas[i], nhead))
                k = nxt
                continue
        elif tags[i] == "RB":
            deps.append((head, "neg" if lemmas[i] == "not" else "advmod", i))
        k += 1


def _constituency_root(clauses, tokens, tags):
    """Constituency tree from the clause structure, built as SyntaxNodes
    DIRECTLY (the bracket string is rendered from these nodes by
    ``_render_ptb``, so string and tree can never diverge and the
    discourse hot path skips the string->tokenize->parse round-trip).
    Every token is a leaf in original order (leaf index == token index —
    the SyntaxTree contract), subordinate clauses wrapped in SBAR with
    their IN marker.  Clause-internal structure stays flat preterminals;
    only the clause / SBAR skeleton matters to get_clauses
    (kernel/clauses.py).  Safe for arbitrary text because ``tokenize``
    strips '(' / ')' characters — a token can never corrupt a rendered
    bracket string."""
    from .syntax import SyntaxNode

    def pre(i, parent):
        # inline two-node preterminal construction (tag node + leaf):
        # SyntaxNode.__init__ via the class call was ~15% of a discourse
        # parse at 2 nodes/token; __new__ + direct slot writes halves it
        node = SyntaxNode.__new__(SyntaxNode)
        node.name = tags[i]
        node.up = parent
        node.index = None
        node._leafidx = None
        leaf = SyntaxNode.__new__(SyntaxNode)
        leaf.name = tokens[i]
        leaf.up = node
        leaf.index = None
        leaf._leafidx = None
        leaf.children = []
        node.children = [leaf]
        parent.children.append(node)

    root = SyntaxNode("ROOT")
    s = SyntaxNode("S", root)
    root.children.append(s)
    cursor = 0

    def flush_upto(limit, into):
        nonlocal cursor
        while cursor < limit:
            pre(cursor, into)
            cursor += 1

    any_part = False
    for marker, kind, idxs in clauses:
        if not idxs:
            continue
        any_part = True
        start = marker if marker is not None else idxs[0]
        flush_upto(start, s)
        if marker is not None:
            cursor = marker + 1
        if kind == "sub" and marker is not None:
            sbar = SyntaxNode("SBAR", s)
            s.children.append(sbar)
            pre(marker, sbar)
            clause = SyntaxNode("S", sbar)
            sbar.children.append(clause)
        elif kind == "cc" and marker is not None:
            pre(marker, s)
            clause = SyntaxNode("S", s)
            s.children.append(clause)
        else:
            clause = SyntaxNode("S", s)
            s.children.append(clause)
        flush_upto(idxs[-1] + 1, clause)
    any_part = any_part or cursor < len(tokens)
    flush_upto(len(tokens), s)
    return root if any_part else None


def _render_ptb(node):
    """Bracket string for a node tree in the exact format the old string
    builder emitted: ``(LABEL child child)``, leaves bare."""
    if node is None:
        return "()"
    if not node.children:
        return node.name
    return "(" + node.name + " " + " ".join(
        _render_ptb(c) for c in node.children) + ")"


def parse_sentence(sentence: str, with_tree: bool = False,
                   render_parse: bool = True):
    """Parse one sentence into the reference parsed_result dict shape.
    ``with_tree=True`` additionally returns the constituency root node
    (the same structure the ``parse`` string is rendered from) as a
    second value, letting the discourse memo build its SyntaxTree without
    re-parsing the bracket string.

    ``render_parse=False`` skips rendering the PTB bracket string (and,
    when ``with_tree`` is also False, building the constituency nodes at
    all) and stores ``parse=None`` — the extraction pipeline's memo paths
    never read the string, and rendering it was ~20% of a seed-mode
    parse.  Default True preserves the full dict for every other caller."""
    tokens = tokenize(sentence)
    tagged = [
        ("NNP", t) if t[:1].isupper() and t.lower() in NER_GAZETTEER
        else tag_and_lemma(t)
        for t in tokens
    ]
    tags = [t for t, _ in tagged]
    lemmas = [l for _, l in tagged]
    _retag(tokens, tags, lemmas)

    deps: list[tuple] = []
    clauses = _split_clauses(tags, lemmas)
    heads: list[int | None] = []
    main_head = None
    last_subject = None

    for marker, kind, idxs in clauses:
        # enhanced-style subject sharing for verb-phrase conjuncts
        inherit = last_subject if kind == "cc" else None
        before = len(deps)
        head = _parse_clause(idxs, tags, lemmas, deps, inherited_subject=inherit)
        heads.append(head)
        subj_edges = [d for g, lab, d in deps[before:] if lab in ("nsubj", "nsubjpass")]
        if subj_edges:
            last_subject = subj_edges[0]
        if head is None:
            continue
        if marker is None and main_head is None:
            main_head = head

    # clause links
    prev_head = None
    pending_sub = []  # (marker, head) of subordinate clauses seen before main
    for (marker, kind, idxs), head in zip(clauses, heads):
        if head is None:
            continue
        if kind == "sub":
            deps.append((head, "mark", marker))
            if prev_head is not None:
                # "that"-complements are ccomp in CoreNLP ("he promised
                # that S"); other subordinators are adverbial clauses
                label = "ccomp" if lemmas[marker] == "that" \
                    else "advcl:" + lemmas[marker]
                deps.append((prev_head, label, head))
            else:
                pending_sub.append(head)
        elif kind == "cc":
            if prev_head is not None:
                deps.append((prev_head, "cc", marker))
                deps.append((prev_head, "conj:" + lemmas[marker], head))
        if kind != "sub":
            prev_head = head
    if main_head is None and heads:
        main_head = next((h for h in heads if h is not None), None)
    for sub_head in pending_sub:  # sentence-initial subordinate clause
        if main_head is not None and main_head != sub_head:
            deps.append((main_head, "advcl:" + lemmas[
                next(m for (m, k, _), h in zip(clauses, heads) if h == sub_head and m is not None)
            ], sub_head))

    # punctuation attaches to the sentence root
    root = main_head if main_head is not None else (heads[0] if heads else None)
    if root is not None:
        for i, t in enumerate(tags):
            if t in (".", ",", "!", "?", ":", ";"):
                deps.append((root, "punct", i))

    uniq = sorted(set(deps), key=lambda e: (e[0], e[2]))
    ners, mentions = _ner_spans(tokens, tags)
    tree_root = (_constituency_root(clauses, tokens, tags)
                 if (render_parse or with_tree) else None)
    parsed = {
        "text": sentence,
        "tokens": tokens,
        "lemmas": lemmas,
        "pos_tags": tags,
        "ners": ners,
        "mentions": mentions,
        "parse": _render_ptb(tree_root) if render_parse else None,
        "dependencies": [e for e in uniq if e[0] != e[2]],
    }
    return (parsed, tree_root) if with_tree else parsed


def parse_text(text: str):
    """Sentence-split + parse a whole turn; returns list of parsed dicts."""
    return [parse_sentence(s) for s in split_sentences(text)]
