"""Discourse-path extraction (v2.0 pipeline): connective candidate scan
(D2) + clause segmentation (P4) + per-clause seed-rule re-extraction (P5).

Mirrors the deterministic halves of the reference's ASER v2.0 stack:

* ``extract_connective_candidates`` — the longest-match scan of
  /root/reference/aser/extract/discourse_parser.py:469-545
  (ConnectiveExtractor._extract_connectives_by_tokens): every surface match
  of a PDTB explicit connective (including the paired ``x..y`` forms),
  longest-first, overlapping spans suppressed.  The reference then filters
  candidates with a pickled sklearn classifier (conn_extractor.pkl) that
  cannot run in this environment — HERE ALL CANDIDATES ARE TREATED AS
  DISCOURSE CONNECTIVES (documented recall-over-precision stub; swap
  ``classify`` for a real model scorer when one is available).
* ``extract_sentence_eventualities_discourse`` — the
  DiscourseEventualityExtractor loop (eventuality_extractor.py:593-692):
  connective token positions become clause separators, each clause's
  token/lemma/pos/dependency slice is REMAPPED to clause-local indices and
  re-extracted with the seed-rule kernel, results are mapped back to
  sentence coordinates and deduplicated on (eid, raw token mapping).
  This replaces the seed path's blunt sentence-level skip-word drop (F3)
  with clause-level behavior: "i was happy when the test passed" yields
  both clause eventualities instead of zero.

The connective inventory is the public PDTB explicit-connective list (the
reference ships it as discourse/conn_feats/exp_conn.txt; originally from
the PDTB 2.0 corpus / Wang & Lan CoNLL-2015 parser resources).
"""

from __future__ import annotations

from .clauses import get_clauses
from .extractor import extract_sentence_eventualities

# PDTB 2.0 explicit connectives (public data; reference exp_conn.txt)
EXPLICIT_CONNECTIVES = [
    "accordingly", "additionally", "after", "afterward", "also",
    "alternatively", "although", "and", "as", "as a result",
    "as an alternative", "as if", "as long as", "as soon as", "as though",
    "as well", "because", "before", "before and after", "besides", "but",
    "by comparison", "by contrast", "by then", "consequently", "conversely",
    "earlier", "either..or", "else", "except", "finally", "for",
    "for example", "for instance", "further", "furthermore", "hence",
    "however", "if", "if and when", "if..then", "in addition", "in contrast",
    "in fact", "in other words", "in particular", "in short", "in sum",
    "in the end", "in turn", "indeed", "insofar as", "instead", "later",
    "lest", "likewise", "meantime", "meanwhile", "moreover", "much as",
    "neither..nor", "nevertheless", "next", "nonetheless", "nor", "now that",
    "on the contrary", "on the one hand..on the other hand",
    "on the other hand", "once", "or", "otherwise", "overall", "plus",
    "previously", "rather", "regardless", "separately", "similarly",
    "simultaneously", "since", "so", "so that", "specifically", "still",
    "then", "thereafter", "thereby", "therefore", "though", "thus", "till",
    "ultimately", "unless", "until", "when", "when and if", "whereas",
    "while", "yet",
]
_SORTED_CONN = sorted(EXPLICIT_CONNECTIVES)

__all__ = ["EXPLICIT_CONNECTIVES", "extract_connective_candidates",
           "extract_sentence_eventualities_discourse"]


def _index_from(tokens, word, start_from=0):
    for i in range(start_from, len(tokens)):
        if tokens[i] == word:
            yield i


def extract_connective_candidates(tokens):
    """All surface connective matches: [{"connective", "indices"}], longest
    match first with overlapping spans suppressed
    (discourse_parser.py:469-545, bit-for-bit semantics)."""
    import bisect

    all_conns = []
    low = [t.lower() for t in tokens]
    n = len(low)
    for t_idx, token in enumerate(low):
        c_idx = bisect.bisect_left(_SORTED_CONN, token)
        while c_idx < len(_SORTED_CONN):
            conn = _SORTED_CONN[c_idx]
            c_idx += 1
            if len(conn) < len(token):
                break
            if not conn.startswith(token):
                break
            if ".." in conn:
                parts = [c.split() for c in conn.split("..")]
                if parts[0][0] != token:
                    break
                if len(parts[0]) + t_idx <= n:
                    if any(low[w + t_idx] != c for w, c in enumerate(parts[0])):
                        continue
                    first = list(range(t_idx, t_idx + len(parts[0])))
                    for s_idx in _index_from(low, parts[1][0], start_from=t_idx):
                        if len(parts[1]) + s_idx <= n and all(
                            low[w + s_idx] == c for w, c in enumerate(parts[1])
                        ):
                            all_conns.append({
                                "connective": conn,
                                "indices": first + list(
                                    range(s_idx, s_idx + len(parts[1]))),
                            })
            else:
                parts = conn.split()
                if parts[0] != token:
                    break
                if len(parts) + t_idx <= n and all(
                    low[w + t_idx] == c for w, c in enumerate(parts)
                ):
                    all_conns.append({
                        "connective": conn,
                        "indices": list(range(t_idx, t_idx + len(parts))),
                    })
    # longest-first, rightmost-first; drop spans overlapping an accepted one
    all_conns.sort(key=lambda x: (-len(x["indices"]), -x["indices"][0]))
    used: set = set()
    out = []
    for cand in all_conns:
        if any(i in used for i in cand["indices"]):
            continue
        used.update(cand["indices"])
        out.append(cand)
    return out


def _clause_slice(clause, tokens, lemmas, pos_tags, deps):
    """Remap one clause's parse slice to clause-local 0..k indices
    (eventuality_extractor.py:620-633)."""
    mapping = {orig: local for local, orig in enumerate(clause)}
    idx_set = set(clause)
    c_deps = [(mapping[g], lab, mapping[d]) for g, lab, d in deps
              if g in idx_set and d in idx_set]
    return (
        [tokens[i] for i in clause],
        [lemmas[i] for i in clause],
        [pos_tags[i] for i in clause],
        sorted(c_deps, key=lambda e: (e[0], e[2])),
    )


def extract_sentence_eventualities_discourse(tokens, lemmas, pos_tags,
                                             dependencies, syntax_tree=None,
                                             use_lemma=True, ners=None):
    """Discourse-path eventualities for one parsed sentence, sorted by
    sentence-coordinate position.  Records match the seed kernel's shape;
    ``raw_indices``/``position`` are in SENTENCE coordinates."""
    conns = extract_connective_candidates(tokens)
    sep = set()
    for c in conns:
        sep.update(c["indices"])
    clauses = get_clauses(tokens, syntax_tree, sep)

    out = []
    seen = set()
    for clause in clauses:
        c_tokens, c_lemmas, c_tags, c_deps = _clause_slice(
            list(clause), tokens, lemmas, pos_tags, dependencies)
        c_ners = [ners[i] for i in clause] if ners else None
        evs = extract_sentence_eventualities(
            c_tokens, c_lemmas, c_tags, c_deps, use_lemma=use_lemma,
            ners=c_ners)
        for e in evs:
            raw = tuple(clause[i] for i in e["raw_indices"])
            key = (e["eid"], raw)
            if key in seen:          # same eid + same raw mapping -> dup
                continue
            seen.add(key)
            e = dict(e, raw_indices=list(raw),
                     position=(sum(raw) / len(raw)) if raw else 0.0)
            out.append(e)
    out.sort(key=lambda e: e["position"])
    return out
