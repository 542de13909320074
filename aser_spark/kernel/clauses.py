"""Clause segmentation (P4): separator + connective splitting, punctuation
stripping, and constituency SBAR sub-splitting.

Semantics mirrored from /root/reference/aser/extract/utils.py:349-404
(get_clauses) and :473-506 (strip_punctuations): a sentence is cut at
clause-separator tokens and at supplied separator indices (typically the
extracted discourse-connective token positions); each contiguous run is
punctuation-stripped, then split ONCE more if the constituency tree has an
SBAR subtree covering a strict subset of it (the reference applies a single
SBAR split, not a recursion — its recursive variant is commented out).
"""

from __future__ import annotations

# token inventories from the reference (utils.py:27-29) — PTB punctuation
PUNCTUATION_SET = frozenset(list("""!"#&'*+,-..../:;<=>?@[\\]^_`|~""") + ["``", "''"])
CLAUSE_SEPARATOR_SET = frozenset(list(".,:;?!~-") + ["..", "...", "--", "---"])

__all__ = ["PUNCTUATION_SET", "CLAUSE_SEPARATOR_SET", "strip_punctuations",
           "get_clauses"]


def strip_punctuations(tokens, indices):
    """Drop leading/trailing punctuation token indices (utils.py:473-506)."""
    lo, hi = 0, len(indices)
    n = len(tokens)
    while lo < hi:
        if indices[lo] >= n:
            break
        t = tokens[indices[lo]]
        if t in PUNCTUATION_SET or t in ("-LCB-", "-LRB-"):
            lo += 1
        else:
            break
    while lo < hi:
        if indices[hi - 1] >= n:
            hi -= 1
            continue
        t = tokens[indices[hi - 1]]
        if t in PUNCTUATION_SET or t in ("-LCB-", "-LRB-"):
            hi -= 1
        else:
            break
    if lo == 0 and hi == len(indices):
        return indices
    return indices[lo:hi]


def _find_sbar_split(clause, syntax_tree):
    """One SBAR split over ``clause`` (sorted token indices) using the
    constituency tree; returns [clause] or [part1, part2] ordered by first
    token (utils.py:361-382)."""
    clause = tuple(clause)
    if syntax_tree is None or syntax_tree.tree is None:
        return [clause]
    sub = syntax_tree.get_subtree_by_token_indices(clause)
    if sub.tree is None:
        return [clause]
    for node in sub.tree.traverse():
        if node.name == "SBAR":
            leaves = {leaf.index for leaf in node.get_leaves()}
            if len(leaves) == len(clause):
                continue
            in_sbar, out_sbar = [], []
            for idx in clause:
                (in_sbar if idx in leaves else out_sbar).append(idx)
            if not in_sbar or not out_sbar:
                continue
            if in_sbar[0] < out_sbar[0]:
                return [tuple(in_sbar), tuple(out_sbar)]
            return [tuple(out_sbar), tuple(in_sbar)]
    return [clause]


def get_clauses(tokens, syntax_tree=None, sep_indices=None):
    """Split one sentence's token indices into clauses.

    :param tokens: the sentence tokens
    :param syntax_tree: optional aser_spark.nlp.syntax.SyntaxTree
    :param sep_indices: extra separator token indices (connective spans)
    :return: list of tuples of token indices
    """
    seps = set(sep_indices) if sep_indices else set()
    n = len(tokens)
    clauses = []
    cur = []
    for i, tok in enumerate(tokens):
        valid = tok not in CLAUSE_SEPARATOR_SET and i not in seps
        if valid:
            cur.append(i)
        if i == n - 1 or not valid:
            cur = strip_punctuations(tokens, cur)
            if cur:
                clauses.extend(_find_sbar_split(cur, syntax_tree))
            cur = []
    return clauses
