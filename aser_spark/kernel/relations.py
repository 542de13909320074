"""Seed-rule discourse relation tagging over eventuality pairs.

From-scratch re-implementation of the reference's deterministic v1.0
relation path (/root/reference/aser/extract/relation_extractor.py:149-345):

* every intra-sentence ordered pair (head.position < tail.position) gets a
  ``Co_Occurrence`` instance, plus one instance per connective sense whose
  verification passes (':165-178', ':212-224').
* one-sentence verification (':240-280'): connective phrase present in the
  token stream, head/tail token sets disjoint, an ``advcl``-family edge must
  connect a head token to a tail token after contracting each eventuality to
  a super-node (':317-345'), and the connective's mean token position must
  fall between the two eventualities (after them for 'instead').
* adjacent-sentence verification (':180-192', ':282-315'): fires only when
  BOTH sentences have exactly one eventuality, with a <10 distance guard on
  mean positions in concatenated-token coordinates.
* rid = sha1(hid + "$" + tid) (/root/reference/aser/relation.py:37-50);
  sense universe /root/reference/aser/relation.py:5-12; seed connective
  phrases /root/reference/aser/extract/rule.py:1565-1581.
"""

from __future__ import annotations

import hashlib

__all__ = ["RELATION_SENSES", "SEED_CONNECTIVES", "rid_of",
           "extract_paragraph_relations"]

RELATION_SENSES = (
    "Precedence", "Succession", "Synchronous", "Reason", "Result",
    "Condition", "Contrast", "Concession", "Conjunction", "Instantiation",
    "Restatement", "ChosenAlternative", "Alternative", "Exception",
    "Co_Occurrence",
)

# sense -> list of connective token phrases (rule.py:1565-1581)
SEED_CONNECTIVES: dict[str, tuple] = {
    "Precedence": (("before",),),
    "Succession": (("after",),),
    "Synchronous": (("meanwhile",), ("at", "the", "same", "time")),
    "Reason": (("because",),),
    "Result": (("so",), ("thus",), ("therefore",)),
    "Condition": (("if",),),
    "Contrast": (("but",), ("however",)),
    "Concession": (("although",),),
    "Conjunction": (("and",), ("also",)),
    "Instantiation": (("for", "example"), ("for", "instance")),
    "Restatement": (("in", "other", "words"),),
    "Alternative": (("or",), ("unless",)),
    "ChosenAlternative": (("instead",),),
    "Exception": (("except",),),
    "Co_Occurrence": (),
}


def rid_of(hid: str, tid: str) -> str:
    return hashlib.sha1((hid + "$" + tid).encode("utf-8")).hexdigest()


def _phrase_in(connective, tokens, token_set):
    """Both checks of the reference: every word present, and the joined
    phrase a substring of the joined sentence (relation_extractor.py:249-256)."""
    if not token_set.issuperset(connective):
        return False
    return " ".join(connective) in " ".join(tokens)


def _mean_index(connective, tokens):
    """Mean of each connective word's FIRST occurrence index
    (relation_extractor.py:243-247)."""
    positions = [tokens.index(w) for w in connective]
    return sum(positions) / len(positions) if positions else 0.0


def _advcl_links(head_idx: frozenset, tail_idx: frozenset, deps) -> bool:
    """Contract head/tail token sets to super-nodes and test for an
    advcl-family edge head->tail (relation_extractor.py:257-268, :317-345).
    Returns False too when the eventualities overlap (contraction invalid)."""
    if head_idx & tail_idx:
        return False
    for g, lab, d in deps:
        if g in head_idx and d in tail_idx and "advcl" in lab:
            return True
    return False


def _present_connectives(tokens):
    """Pair-invariant precomputation for one sentence: for each sense (in
    rule order) the phrase-present connectives (in rule order) with their
    mean first-occurrence index and 'instead' flag.  Phrase presence and
    the mean index depend only on the sentence, so hoisting them out of
    the O(pairs) loop changes nothing about which senses fire."""
    token_set = set(tokens)
    joined = " ".join(tokens)
    out = []
    for sense in RELATION_SENSES:
        cands = []
        for connective in SEED_CONNECTIVES[sense]:
            if not token_set.issuperset(connective):
                continue
            if " ".join(connective) not in joined:
                continue
            cands.append((_mean_index(connective, tokens),
                          "instead" in connective))
        if cands:
            out.append((sense, cands))
    return out


def senses_same_sentence(head, tail, tokens, deps, _present=None):
    """All senses for one intra-sentence ordered pair; Co_Occurrence is
    unconditional (relation_extractor.py:212-224)."""
    if _present is None:
        _present = _present_connectives(tokens)
    senses = ["Co_Occurrence"]
    head_idx = frozenset(head["raw_indices"])
    tail_idx = frozenset(tail["raw_indices"])
    linked = None  # computed lazily; shared across senses
    h, t = head["position"], tail["position"]
    for sense, cands in _present:
        for cpos, is_instead in cands:
            if linked is None:
                linked = _advcl_links(head_idx, tail_idx, deps)
            if not linked:
                # original loop kept scanning but could never append once
                # the contraction test failed — same result, done early
                return senses
            ok = (h < t < cpos) if is_instead else (h < cpos < t)
            if ok:
                senses.append(sense)
                break
    return senses


def senses_adjacent_sentences(head, tail, s1_tokens, s2_tokens):
    """Senses for the 1-eventuality-each adjacent-sentence case
    (relation_extractor.py:226-238, :282-315)."""
    senses = []
    offset = len(s1_tokens)
    tokens = list(s1_tokens) + list(s2_tokens)
    token_set = set(tokens)
    h = head["position"]
    t = tail["position"] + offset
    if not t - h < 10:
        return senses
    for sense in RELATION_SENSES:
        for connective in SEED_CONNECTIVES[sense]:
            if not _phrase_in(connective, tokens, token_set):
                continue
            cpos = _mean_index(connective, tokens)
            ok = (h < t < cpos) if "instead" in connective else (h < cpos < t)
            if ok:
                senses.append(sense)
                break
    return senses


def extract_paragraph_relations(sentences, para_eventualities, window=None):
    """Relation instances for one paragraph (= one conversation window).

    ``sentences``: list of dicts with at least tokens + dependencies;
    ``para_eventualities``: matching list of per-sentence eventuality-record
    lists (position-ordered).  Returns flat instance rows
    (hid, tid, sense, weight=1.0) — aggregation into weighted edges happens
    downstream in Spark (groupBy hid,tid,sense).

    ``window=(start, stop)`` bounds EMISSION by anchor sentence index while
    the full list still provides context: a same-sentence pair is anchored
    at its sentence, an adjacent-sentence pair at the LATER sentence.  The
    giant-conversation split (pipeline/extract.py) uses this so each chunk
    emits exactly the relations it owns — a boundary pair (i, i+1) is
    owned by the chunk whose core contains i+1, which always carries
    sentence i as prefix context.
    """
    start, stop = window if window else (0, len(sentences))
    rows = []
    for i in range(start, stop):
        sent, evs = sentences[i], para_eventualities[i]
        if len(evs) < 2:
            continue
        tokens = sent["tokens"]
        deps = [tuple(e) for e in sent["dependencies"]]
        present = _present_connectives(tokens)
        for head in evs:
            for tail in evs:
                if not head["position"] < tail["position"]:
                    continue
                for sense in senses_same_sentence(head, tail, tokens, deps,
                                                  present):
                    rows.append((head["eid"], tail["eid"], sense, 1.0))

    for i in range(max(start - 1, 0), min(stop - 1, len(sentences) - 1)):
        evs1, evs2 = para_eventualities[i], para_eventualities[i + 1]
        if len(evs1) == 1 and len(evs2) == 1:
            head, tail = evs1[0], evs2[0]
            for sense in senses_adjacent_sentences(
                head, tail, sentences[i]["tokens"], sentences[i + 1]["tokens"]
            ):
                rows.append((head["eid"], tail["eid"], sense, 1.0))
    return rows
