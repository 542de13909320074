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
    # Equivalent to the reference's pruned-subtree walk
    # (get_subtree_by_token_indices + traverse) WITHOUT materializing the
    # clone: a node exists in the pruned subtree iff it has >=1 kept leaf,
    # its pruned leaf set is (original leaves ∩ clause), and the pruned
    # preorder is the original preorder filtered to kept nodes — so
    # first-SBAR-match order is identical (was the #1 hot spot: ~330k
    # SyntaxNode clones per 8k turns).
    cset = set(clause)
    for leaves_all in _sbar_leafsets(syntax_tree):
        leaves = leaves_all & cset
        if not leaves or len(leaves) == len(clause):
            continue
        in_sbar, out_sbar = [], []
        for idx in clause:
            (in_sbar if idx in leaves else out_sbar).append(idx)
        if in_sbar[0] < out_sbar[0]:
            return [tuple(in_sbar), tuple(out_sbar)]
        return [tuple(out_sbar), tuple(in_sbar)]
    return [clause]


def _sbar_leafsets(syntax_tree):
    """Leaf-index sets of every SBAR node in preorder, memoized on the
    tree.  Trees are parse-memo residents shared across every clause of
    every occurrence of a sentence, so this computes once per UNIQUE
    sentence instead of once per clause (write-once, idempotent — safe
    under the serving daemon's threads)."""
    cache = getattr(syntax_tree, "_sbar_leafsets", None)
    if cache is None:
        # leaf_indices() is the per-node write-once cache of exactly the
        # leaf-index set needed here — reuse it instead of re-walking the
        # subtree per SBAR (same values: it collects index over the
        # subtree's leaves)
        cache = [frozenset(node.leaf_indices())
                 for node in syntax_tree.tree.traverse()
                 if node.name == "SBAR"]
        syntax_tree._sbar_leafsets = cache
    return cache


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
