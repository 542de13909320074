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


# Majority PDTB sense per explicit connective — the deterministic stand-in
# for the reference's pickled ExplicitSenseClassifier (D6): PDTB 2.0's
# most-frequent explicit sense for each form, folded onto the reference's
# 14-sense universe (aser/relation.py:5-12).  Connectives with no dominant
# mappable sense are omitted (no relation emitted).
CONNECTIVE_SENSES = {
    "before": "Precedence", "then": "Precedence", "next": "Precedence",
    "afterward": "Precedence", "later": "Precedence", "until": "Precedence",
    "till": "Precedence",
    "after": "Succession", "once": "Succession", "earlier": "Succession",
    "previously": "Succession", "as soon as": "Succession",
    "meanwhile": "Synchronous", "at the same time": "Synchronous",
    "when": "Synchronous", "while": "Synchronous", "meantime": "Synchronous",
    "simultaneously": "Synchronous",
    "because": "Reason", "since": "Reason", "now that": "Reason",
    "insofar as": "Reason",
    "so": "Result", "thus": "Result", "therefore": "Result",
    "hence": "Result", "consequently": "Result", "as a result": "Result",
    "accordingly": "Result", "so that": "Result", "thereby": "Result",
    "if": "Condition", "if..then": "Condition", "as long as": "Condition",
    "but": "Contrast", "however": "Contrast", "by contrast": "Contrast",
    "by comparison": "Contrast", "in contrast": "Contrast",
    "conversely": "Contrast", "on the other hand": "Contrast",
    "whereas": "Contrast",
    "although": "Concession", "though": "Concession",
    "nevertheless": "Concession", "nonetheless": "Concession",
    "still": "Concession", "yet": "Concession",
    "and": "Conjunction", "also": "Conjunction", "in addition": "Conjunction",
    "additionally": "Conjunction", "besides": "Conjunction",
    "furthermore": "Conjunction", "moreover": "Conjunction",
    "plus": "Conjunction", "as well": "Conjunction", "nor": "Conjunction",
    "neither..nor": "Conjunction", "likewise": "Conjunction",
    "similarly": "Conjunction",
    "for example": "Instantiation", "for instance": "Instantiation",
    "in other words": "Restatement", "in fact": "Restatement",
    "indeed": "Restatement", "specifically": "Restatement",
    "or": "Alternative", "unless": "Alternative", "either..or": "Alternative",
    "alternatively": "Alternative", "as an alternative": "Alternative",
    "instead": "ChosenAlternative", "rather": "ChosenAlternative",
    "except": "Exception",
}


def match_argument_eventuality(arg_indices, eventuality, method: str = "Simpson",
                               threshold: float = 0.8) -> bool:
    """J3 theta-join predicate: argument span <-> eventuality raw-token
    overlap (relation_extractor.py:473-520, the raw_sent_mapping branch —
    our records always carry ``raw_indices``).

    Simpson = |A ∩ E| / min(|A|, |E|);  Jaccard = |A ∩ E| / |A ∪ E|."""
    a = set(arg_indices)
    b = set(eventuality["raw_indices"])
    if not a or not b:
        return False
    inter = len(a & b)
    denom = min(len(a), len(b)) if method == "Simpson" else len(a | b)
    return inter / denom >= threshold


# PDTB syntactic category per explicit connective (public PDTB data;
# the reference ships it as discourse/feats/conn_category.txt)
CONNECTIVE_CATEGORIES = {
    "accordingly": "adverbial",
    "additionally": "adverbial",
    "afterward": "adverbial",
    "also": "adverbial",
    "alternatively": "adverbial",
    "as a result": "adverbial",
    "as an alternative": "adverbial",
    "as well": "adverbial",
    "besides": "adverbial",
    "by comparison": "adverbial",
    "by contrast": "adverbial",
    "consequently": "adverbial",
    "conversely": "adverbial",
    "earlier": "adverbial",
    "either or": "adverbial",
    "except": "adverbial",
    "finally": "adverbial",
    "for example": "adverbial",
    "for instance": "adverbial",
    "further": "adverbial",
    "furthermore": "adverbial",
    "hence": "adverbial",
    "in addition": "adverbial",
    "in contrast": "adverbial",
    "in fact": "adverbial",
    "in other words": "adverbial",
    "in particular": "adverbial",
    "in short": "adverbial",
    "in sum": "adverbial",
    "in the end": "adverbial",
    "in turn": "adverbial",
    "indeed": "adverbial",
    "instead": "adverbial",
    "later": "adverbial",
    "likewise": "adverbial",
    "meantime": "adverbial",
    "meanwhile": "adverbial",
    "moreover": "adverbial",
    "nevertheless": "adverbial",
    "next": "adverbial",
    "nonetheless": "adverbial",
    "on the contrary": "adverbial",
    "on the other hand": "adverbial",
    "otherwise": "adverbial",
    "overall": "adverbial",
    "previously": "adverbial",
    "rather": "adverbial",
    "regardless": "adverbial",
    "separately": "adverbial",
    "similarly": "adverbial",
    "simultaneously": "adverbial",
    "specifically": "adverbial",
    "still": "adverbial",
    "thereafter": "adverbial",
    "thereby": "adverbial",
    "therefore": "adverbial",
    "thus": "adverbial",
    "ultimately": "adverbial",
    "whereas": "adverbial",
    "by then": "adverbial",
    "and": "coordinator",
    "but": "coordinator",
    "else": "coordinator",
    "if then": "coordinator",
    "neither nor": "coordinator",
    "nor": "coordinator",
    "on the one hand on the other hand": "coordinator",
    "or": "coordinator",
    "plus": "coordinator",
    "then": "coordinator",
    "yet": "coordinator",
    "after": "subordinator",
    "although": "subordinator",
    "as": "subordinator",
    "as if": "subordinator",
    "as long as": "subordinator",
    "as soon as": "subordinator",
    "as though": "subordinator",
    "because": "subordinator",
    "before": "subordinator",
    "before and after": "subordinator",
    "for": "subordinator",
    "however": "subordinator",
    "if": "subordinator",
    "if and when": "subordinator",
    "insofar as": "subordinator",
    "lest": "subordinator",
    "much as": "subordinator",
    "now that": "subordinator",
    "once": "subordinator",
    "since": "subordinator",
    "so": "subordinator",
    "so that": "subordinator",
    "though": "subordinator",
    "till": "subordinator",
    "unless": "subordinator",
    "until": "subordinator",
    "when": "subordinator",
    "when and if": "subordinator",
    "while": "subordinator",
}


# D4 SSArgumentExtractor constituent-argument feature families
# (discourse_parser.py:1182-1266); the per-candidate ss_arg classifier is
# pickled (absent in-sandbox)
SS_ARG_FEATURE_FAMILIES = (
    ("conn", "feat"), ("conn_lower", "feat"), ("nt_ctx", "feat"),
    ("conn_nt_path", "feat"), ("conn_nt_path_left_number", "feat"),
    ("conn_category", "feat"), ("left_number", "raw"),
    ("right_number", "raw"), ("conn_nt_position", "feat"),
)


def constituent_candidates(indices, syntax_tree):
    """Argument-candidate constituents for one connective: the connective
    node's non-connective children (multi-token connectives only) plus the
    siblings of every ancestor up to the root — mirrors
    SSArgumentExtractor._get_constituents (discourse_parser.py:1110-1144).
    Returns [{"node", "indices"}] with global token indices."""
    out = []
    if syntax_tree.tree is None:
        return out
    nodes = []
    if len(indices) == 1:
        conn_node = syntax_tree.get_leaf_node_by_token_index(indices[0]).up
    else:
        conn_node = syntax_tree.get_common_ancestor_by_token_indices(indices)
        conn_leaves = {id(syntax_tree.get_leaf_node_by_token_index(i))
                       for i in indices}
        for child in conn_node.get_children():
            leaves = {id(l) for l in child.get_leaves()}
            if not (conn_leaves & leaves):
                nodes.append(child)
    curr = conn_node
    while not curr.is_root():
        nodes.extend(syntax_tree.get_siblings(curr))
        curr = curr.up
    for node in nodes:
        out.append({
            "node": node,
            "indices": sorted(leaf.index for leaf in node.get_leaves()),
        })
    return out


def ss_argument_feature_strings(doc_parsed, sent_idx, conn_indices,
                                syntax_tree,
                                conn_category_mapping=CONNECTIVE_CATEGORIES):
    """Per-constituent raw values for the 9 D4 families
    (discourse_parser.py:1182-1266): one dict per candidate constituent,
    sorted by first token, each carrying its token "indices"."""
    sp = doc_parsed[sent_idx]
    conn = " ".join(sp["tokens"][i] for i in conn_indices)
    conn_lower = conn.lower()
    conn_category = conn_category_mapping[conn_lower]
    try:
        conn_node = syntax_tree.get_self_category_node_by_token_indices(
            conn_indices)
    except Exception:
        return []
    if conn_node is None:
        return []

    left_number = right_number = 0
    if conn_node.up is not None:
        children = conn_node.up.get_children()
        for ci, child in enumerate(children):
            if child is conn_node:
                left_number, right_number = ci, len(children) - 1 - ci
                break

    cands = constituent_candidates({"indices": conn_indices}["indices"],
                                   syntax_tree)
    cands.sort(key=lambda x: x["indices"][0])
    rows = []
    for cand in cands:
        node = cand["node"]
        parent, left, right = node.up, None, None
        if parent is not None:
            children = parent.get_children()
            for ci, child in enumerate(children):
                if child is node:
                    if ci > 0:
                        left = children[ci - 1]
                    if ci < len(children) - 1:
                        right = children[ci + 1]
                    break
        nt_ctx = "-".join([
            node.name,
            parent.name if parent is not None else "NULL",
            left.name if left is not None else "NULL",
            right.name if right is not None else "NULL",
        ])
        conn_nt_path = syntax_tree.get_node_to_node_path(conn_node, node)
        rows.append({
            "indices": cand["indices"],
            "conn": conn,
            "conn_lower": conn_lower,
            "nt_ctx": nt_ctx,
            "conn_nt_path": conn_nt_path,
            "conn_nt_path_left_number":
                conn_nt_path + (":>1" if left_number > 1 else ":<=1"),
            "conn_category": conn_category,
            "left_number": left_number,
            "right_number": right_number,
            "conn_nt_position": syntax_tree.get_relative_position(conn_node, node),
        })
    return rows


# D5 PSArgumentExtractor feature families (discourse_parser.py:1448-1705):
# arg1 candidates = clauses of the PREVIOUS sentence, arg2 candidates =
# clauses of the connective's sentence split at the connective; the two
# pickled clause classifiers are absent in-sandbox
PS_ARG1_FEATURE_FAMILIES = (
    ("verb_lemma", "list"), ("clause_first", "feat"), ("clause_last", "feat"),
    ("prev_clause_first", "feat"), ("conn_lower", "feat"),
    ("conn_category", "feat"),
)
PS_ARG2_FEATURE_FAMILIES = (
    ("clause_production_rule", "list"), ("clause_first", "feat"),
    ("clause_first_prev_last_parse_path", "feat"), ("next", "feat"),
    ("conn_to_root_path", "feat"), ("conn", "feat"), ("prev", "feat"),
    ("clause_last_next", "feat"), ("conn_lower", "feat"),
    ("conn_conn_ctx", "feat"), ("compressed_cparent_to_root_path", "feat"),
    ("cpos", "feat"), ("cparent_to_root_path_node_name", "list"),
    ("conn_category", "feat"),
)

_VERB_POS = frozenset(("VB", "VBD", "VBG", "VBN", "VBP", "VBZ"))


def _adjacent_index(doc_parsed, sent_idx, idx, step, skip_tokens):
    """(sent_idx, idx) of the adjacent non-skip token, or (-1, -1) —
    mirrors utils.get_prev/next_token_index with skip_tokens."""
    s, i = sent_idx, idx
    for _ in range(_MAX_ATTEMPT):
        if step < 0:
            if i - 1 >= 0:
                i -= 1
            elif s - 1 >= 0:
                s -= 1
                i = len(doc_parsed[s]["tokens"]) - 1
            else:
                return -1, -1
        else:
            if i + 1 < len(doc_parsed[s]["tokens"]):
                i += 1
            elif s + 1 < len(doc_parsed):
                s += 1
                i = 0
            else:
                return -1, -1
        if doc_parsed[s]["tokens"][i] not in skip_tokens:
            return s, i
    return -1, -1


def _clause_prev_string(doc_parsed, home_sent, clause_start, fallback_ok):
    """The reference's clause-left-context string: the nearest non-separator
    token if adjacent, else the separator run between; sentinel rules
    mirrored from discourse_parser.py:1476-1496 (arg1) / :1576-1596 (arg2),
    which differ only in the out-of-sentence fallback condition."""
    from .clauses import CLAUSE_SEPARATOR_SET

    sp = doc_parsed[home_sent]
    if clause_start == 0:
        return "NONE"
    ps, pi = _adjacent_index(doc_parsed, home_sent, clause_start, -1,
                             CLAUSE_SEPARATOR_SET)
    if ps == home_sent:
        if pi + 1 == clause_start:
            return sp["tokens"][pi]
        return " ".join(sp["tokens"][i] for i in range(pi + 1, clause_start))
    if fallback_ok(ps):
        return " ".join(sp["tokens"][i] for i in range(0, clause_start))
    return "NONE"


def ps_argument1_feature_strings(doc_parsed, sent_idx, conn_indices,
                                 prev_tree,
                                 conn_category_mapping=CONNECTIVE_CATEGORIES):
    """Per-clause raw values for the 6 D5-arg1 families: candidates are the
    clauses of the PREVIOUS sentence (discourse_parser.py:1448-1515)."""
    sp = doc_parsed[sent_idx - 1]
    clauses = get_clauses(sp["tokens"], prev_tree, None)
    if not clauses:
        return []
    conn = " ".join(doc_parsed[sent_idx]["tokens"][i] for i in conn_indices)
    conn_lower = conn.lower()
    conn_category = conn_category_mapping[conn_lower]
    rows = []
    for clause in clauses:
        clause = list(clause)
        clause_first = sp["tokens"][clause[0]]
        clause_last = sp["tokens"][clause[-1]]
        prev = _clause_prev_string(doc_parsed, sent_idx - 1, clause[0],
                                   lambda ps: ps + 1 == sent_idx - 1)
        verb_lemmas = [sp["lemmas"][i] for i in clause
                       if sp["pos_tags"][i] in _VERB_POS]
        rows.append({
            "indices": clause,
            "verb_lemma": verb_lemmas,
            "clause_first": clause_first,
            "clause_last": clause_last,
            "prev_clause_first": prev + "|" + clause_first,
            "conn_lower": conn_lower,
            "conn_category": conn_category,
        })
    return rows


def ps_argument2_feature_strings(doc_parsed, sent_idx, conn_indices, tree,
                                 conn_category_mapping=CONNECTIVE_CATEGORIES):
    """Per-clause raw values for the 14 D5-arg2 families: candidates are the
    connective sentence's clauses split at the connective
    (discourse_parser.py:1517-1705)."""
    from .clauses import CLAUSE_SEPARATOR_SET

    sp = doc_parsed[sent_idx]
    clauses = get_clauses(sp["tokens"], tree, set(conn_indices))
    if not clauses:
        return []
    conn = " ".join(sp["tokens"][i] for i in conn_indices)
    conn_lower = conn.lower()
    conn_category = conn_category_mapping[conn_lower]
    cpos = "_".join(sp["pos_tags"][i] for i in conn_indices)
    try:
        conn_node = tree.get_self_category_node_by_token_indices(conn_indices)
    except Exception:
        return []
    if conn_node is None:
        return []
    parent = conn_node.up
    left = right = None
    if parent is not None:
        children = parent.get_children()
        for ci, child in enumerate(children):
            if child is conn_node:
                if ci > 0:
                    left = children[ci - 1]
                if ci < len(children) - 1:
                    right = children[ci + 1]
    conn_ctx = "-".join([
        conn_node.name,
        parent.name if parent is not None else "NULL",
        left.name if left is not None else "NULL",
        right.name if right is not None else "NULL",
    ])

    try:
        conn_paths, cparent_paths = [], []
        for i in conn_indices:
            leaf = tree.get_leaf_node_by_token_index(i)
            conn_paths.append(tree.get_node_path_to_root(leaf))
            cparent_paths.append(tree.get_node_path_to_root(leaf.up))
        node_names = [n for p in cparent_paths for n in p.split("-->")]
        conn_to_root_path = "&".join(conn_paths)
        compressed = "&".join(_compressed_path(p) for p in cparent_paths)
    except Exception:
        node_names = ["NONE_TREE"]
        conn_to_root_path = "NONE_TREE"
        compressed = "NONE_TREE"

    rows = []
    for clause_idx, clause in enumerate(clauses):
        clause = list(clause)
        clause_first = sp["tokens"][clause[0]]
        clause_last = sp["tokens"][clause[-1]]
        prev = _clause_prev_string(doc_parsed, sent_idx, clause[0],
                                   lambda ps: clause[0] - 1 >= 0)
        # next context (mirror of prev, discourse_parser.py:1597-1617)
        if clause[-1] == len(sp["tokens"]) - 1:
            nxt = "NONE"
        else:
            ns, ni = _adjacent_index(doc_parsed, sent_idx, clause[-1], +1,
                                     CLAUSE_SEPARATOR_SET)
            if ns == sent_idx:
                if ni - 1 == clause[-1]:
                    nxt = sp["tokens"][ni]
                else:
                    nxt = " ".join(sp["tokens"][i]
                                   for i in range(clause[-1] + 1, ni))
            elif clause[-1] + 1 < len(sp["tokens"]):
                nxt = " ".join(sp["tokens"][i]
                               for i in range(clause[-1] + 1, len(sp["tokens"])))
            else:
                nxt = "NONE"

        try:
            clause_first_node = tree.get_leaf_node_by_token_index(clause[0]).up
            prev_last_node = (
                tree.get_leaf_node_by_token_index(
                    list(clauses[clause_idx - 1])[-1]).up
                if clause_idx > 0 else None)
        except Exception:
            clause_first_node = prev_last_node = None

        rules = []
        if tree.tree is not None:
            for node in tree.get_subtree_by_token_indices(clause).tree.traverse():
                if not node.is_leaf():
                    rules.append(node.name + "-->" + " ".join(
                        c.name for c in node.get_children()))

        try:
            if prev_last_node is not None:
                cf_path = tree.get_node_to_node_path(clause_first_node,
                                                     prev_last_node)
            else:
                cf_path = "NONE"
        except Exception:
            cf_path = "NONE_TREE"

        rows.append({
            "indices": clause,
            "clause_production_rule": rules,
            "clause_first": clause_first,
            "clause_first_prev_last_parse_path": cf_path,
            "next": nxt,
            "conn_to_root_path": conn_to_root_path,
            "conn": conn,
            "prev": prev,
            "clause_last_next": clause_last + "|" + nxt,
            "conn_lower": conn_lower,
            "conn_conn_ctx": conn + "|" + conn_ctx,
            "compressed_cparent_to_root_path": compressed,
            "cpos": cpos,
            "cparent_to_root_path_node_name": node_names,
            "conn_category": conn_category,
        })
    return rows


def parallel_connective_args(tokens, indices):
    """D4's PARALLEL path for discontinuous connectives (either..or):
    arg1 = the span between the two connective parts, arg2 = the span after
    the second part, both punctuation-stripped — mirrors
    SSArgumentExtractor._get_parallel_clauses (discourse_parser.py:1110-1137)
    EXACTLY, including its quirk of seeding arg1's start from the list
    POSITION of the gap (not the token index); for the dominant
    sentence-initial either..or case the two coincide."""
    from .clauses import strip_punctuations

    conn_idx1 = conn_idx2 = indices[-1]
    for k in range(len(indices) - 1):
        if indices[k] + 1 < indices[k + 1]:
            conn_idx1 = k
            break
    arg1 = strip_punctuations(tokens, list(range(conn_idx1 + 1, conn_idx2)))
    arg2 = strip_punctuations(tokens, list(range(conn_idx2 + 1, len(tokens))))
    out = []
    if arg1:
        out.append(arg1)
    if arg2:
        out.append(arg2)
    return out


def extract_ss_discourse_relations(tokens, eventualities, syntax_tree=None,
                                   method: str = "Simpson",
                                   threshold: float = 0.8):
    """Same-sentence v2.0 relation path with deterministic stand-ins:

    connective candidates (D2) -> argument spans = the clauses adjacent to
    the connective (SSArgumentExtractor stand-in: nearest clause ending
    before the connective = arg1, first clause starting after it = arg2) ->
    majority-sense mapping (D6 stand-in) -> J3 Simpson/Jaccard matching of
    each span to eventualities -> relation instances weighted
    1/(|E1|*|E2|), the reference's fan normalization
    (relation_extractor.py:437-451)."""
    conns = extract_connective_candidates(tokens)
    sep = set()
    for c in conns:
        sep.update(c["indices"])
    clauses = get_clauses(tokens, syntax_tree, sep)
    rows = []
    for c in conns:
        sense = CONNECTIVE_SENSES.get(c["connective"])
        if sense is None:
            continue
        start = c["indices"][0]
        discontinuous = any(c["indices"][k] + 1 < c["indices"][k + 1]
                            for k in range(len(c["indices"]) - 1))
        if discontinuous:
            # D4 parallel path: either..or / if..then argument spans
            args = parallel_connective_args(tokens, c["indices"])
            if len(args) != 2:
                continue
            arg1, arg2 = args
        else:
            before = [cl for cl in clauses if cl and max(cl) < start]
            after = sorted([cl for cl in clauses if cl and min(cl) > start],
                           key=lambda cl: min(cl))
            if before and after:
                # medial connective: "P because Q" -> arg1 = P, arg2 = Q
                arg1 = max(before, key=lambda cl: max(cl))
                arg2 = after[0]
            elif not before and len(after) >= 2:
                # sentence-INITIAL subordinator: "because Q, P" -> PDTB
                # order: arg2 = the clause after the connective, arg1 = next
                arg2, arg1 = after[0], after[1]
            else:
                continue
        e1s = [e for e in eventualities
               if match_argument_eventuality(arg1, e, method, threshold)]
        e2s = [e for e in eventualities
               if match_argument_eventuality(arg2, e, method, threshold)]
        if not e1s or not e2s:
            continue
        cnt = 1.0 / (len(e1s) * len(e2s))
        for e1 in e1s:
            for e2 in e2s:
                rows.append((e1["eid"], e2["eid"], sense, cnt))
    return rows


def extract_paragraph_relations_discourse(sentences, para_eventualities,
                                          syntax_trees=None,
                                          method: str = "Simpson",
                                          threshold: float = 0.8):
    """Paragraph relation instances for the discourse path: unconditional
    Co_Occurrence over intra-sentence ordered pairs (as in v1), the SS
    connective/arg-span relations above, and the v1 adjacent-sentence
    window path (PS classifier stand-in)."""
    from .relations import senses_adjacent_sentences

    if syntax_trees is None:
        syntax_trees = [None] * len(sentences)
    rows = []
    for sent, evs, tree in zip(sentences, para_eventualities, syntax_trees):
        for head in evs:
            for tail in evs:
                if head["position"] < tail["position"]:
                    rows.append((head["eid"], tail["eid"], "Co_Occurrence", 1.0))
        rows.extend(extract_ss_discourse_relations(
            sent["tokens"], evs, tree, method, threshold))
    for i in range(len(sentences) - 1):
        evs1, evs2 = para_eventualities[i], para_eventualities[i + 1]
        if len(evs1) == 1 and len(evs2) == 1:
            head, tail = evs1[0], evs2[0]
            for sense in senses_adjacent_sentences(
                head, tail, sentences[i]["tokens"], sentences[i + 1]["tokens"]
            ):
                rows.append((head["eid"], tail["eid"], sense, 1.0))
    return rows


# ---------------------------------------------------------------------------
# D2 feature generation (the 29 feature families of the reference's
# ConnectiveExtractor, discourse_parser.py:547-758) — fully deterministic
# given a constituency tree; only the LR weights that CONSUME these are
# absent in-sandbox.  `connective_feature_strings` emits the raw feature
# values; `connective_feature_vector` reproduces the reference's
# vocabulary-indexed sparse merge (Feature.get_feature_by_feat +
# merge_features, discourse_parser.py:63-98) given the per-family vocab
# dicts (loaded from a PDTB-style feats directory at deploy time).
# ---------------------------------------------------------------------------

_MAX_ATTEMPT = 10  # utils.py:48

# (family name, kind): 'feat' = single vocab lookup, 'list' = multi lookup,
# 'raw' = numeric passthrough of dimension 1 — in the reference's exact
# merge order (discourse_parser.py:686-752)
CONNECTIVE_FEATURE_FAMILIES = (
    ("cpos", "feat"), ("prev_conn", "feat"), ("prevpos", "feat"),
    ("prevpos_cpos", "feat"), ("conn_next", "feat"), ("nextpos", "feat"),
    ("cpos_nextpos", "feat"), ("cparent_to_root_path", "feat"),
    ("compressed_cparent_to_root_path", "feat"), ("self_category", "feat"),
    ("parent_category", "feat"), ("left_category", "feat"),
    ("right_category", "feat"), ("right_contains_VP", "raw"),
    ("conn_self_category", "feat"), ("conn_parent_category", "feat"),
    ("conn_left_category", "feat"), ("conn_right_category", "feat"),
    ("self_category_parent_category", "feat"),
    ("self_category_right_category", "feat"),
    ("self_category_left_category", "feat"),
    ("parent_category_left_category", "feat"),
    ("parent_category_right_category", "feat"),
    ("left_category_right_category", "feat"),
    ("conn_lower", "feat"), ("conn", "feat"),
    ("cparent_to_root_path_node_name", "list"),
    ("conn_right_ctx", "feat"), ("conn_parent_ctx", "feat"),
)


def _compressed_path(path: str) -> str:
    """Collapse consecutive duplicate labels (discourse_parser.py:392-405)."""
    parts = path.split("-->")
    out = []
    for i in range(len(parts) - 1):
        if parts[i] != parts[i + 1]:
            out.append(parts[i])
    if parts:
        if out:
            if parts[-1] != out[-1]:
                out.append(parts[-1])
        else:
            out.append(parts[-1])
    return "-->".join(out)


def _adjacent_token(doc_parsed, sent_idx, idx, step):
    """Previous (step=-1) / next (step=+1) token across sentence boundaries
    (utils.py:407-470); returns (token, pos) or ("NONE", "NONE")."""
    s, i = sent_idx, idx
    for _ in range(_MAX_ATTEMPT):
        if step < 0:
            if i - 1 >= 0:
                i -= 1
            elif s - 1 >= 0:
                s -= 1
                i = len(doc_parsed[s]["tokens"]) - 1
            else:
                return "NONE", "NONE"
        else:
            if i + 1 < len(doc_parsed[s]["tokens"]):
                i += 1
            elif s + 1 < len(doc_parsed):
                s += 1
                i = 0
            else:
                return "NONE", "NONE"
        return doc_parsed[s]["tokens"][i], doc_parsed[s]["pos_tags"][i]
    return "NONE", "NONE"


def connective_feature_strings(doc_parsed, sent_idx, indices, syntax_tree):
    """Raw values for all 29 feature families of one connective candidate —
    mirrors discourse_parser.py:547-758 exactly (incl. the NONE_TREE /
    NULL / 'None' sentinel conventions and the ROOT parent default)."""
    sp = doc_parsed[sent_idx]
    conn = " ".join(sp["tokens"][i] for i in indices)
    cpos = "_".join(sp["pos_tags"][i] for i in indices)
    prev, prevpos = _adjacent_token(doc_parsed, sent_idx, indices[0], -1)
    nxt, nextpos = _adjacent_token(doc_parsed, sent_idx, indices[-1], +1)

    try:
        paths = []
        for i in indices:
            leaf = syntax_tree.get_leaf_node_by_token_index(i)
            paths.append(syntax_tree.get_node_path_to_root(leaf.up))
        node_names = [n for p in paths for n in p.split("-->")]
        cpath = "&".join(paths)
        compressed = "&".join(_compressed_path(p) for p in paths)
    except Exception:
        node_names = ["NONE_TREE"]
        cpath = "NONE_TREE"
        compressed = "NONE_TREE"

    try:
        node = syntax_tree.get_self_category_node_by_token_indices(indices)
        self_cat = node.name
        parent = node.up
        left = right = None
        if parent is not None:
            parent_cat = parent.name
            children = parent.get_children()
            for ci, child in enumerate(children):
                if child is node:
                    if ci > 0:
                        left = children[ci - 1]
                    if ci < len(children) - 1:
                        right = children[ci + 1]
            left_cat = left.name if left is not None else "NONE"
            right_cat = right.name if right is not None else "NONE"
        else:
            parent_cat, left_cat, right_cat = "ROOT", "NONE", "NONE"

        conn_ctx = "-".join([
            node.name,
            parent.name if parent is not None else "NULL",
            left.name if left is not None else "NULL",
            right.name if right is not None else "NULL",
        ])
        if parent is not None:
            parent_ctx = "-".join(
                [parent.name, parent.up.name if parent.up is not None else "NULL"]
                + [c.name for c in parent.get_children()])
        else:
            parent_ctx = "None"
        left_ctx = ("-".join([left.name, parent.name]
                             + [c.name for c in left.get_children()])
                    if left is not None else "None")
        right_ctx = ("-".join([right.name, parent.name]
                              + [c.name for c in right.get_children()])
                     if right is not None else "None")

        right_vp = False
        if right is not None:
            if right.name in ("VP", "S"):
                right_vp = True
            else:
                right_vp = any(n.name in ("VP", "S")
                               for n in right.get_descendants())
    except Exception:
        self_cat = parent_cat = left_cat = right_cat = "NONE_TREE"
        conn_ctx = parent_ctx = left_ctx = right_ctx = "NONE_TREE"
        right_vp = False

    return {
        "cpos": cpos,
        "prev_conn": prev + "|" + conn,
        "prevpos": prevpos,
        "prevpos_cpos": prevpos + "|" + cpos,
        "conn_next": conn + "|" + nxt,
        "nextpos": nextpos,
        "cpos_nextpos": cpos + "|" + nextpos,
        "cparent_to_root_path": cpath,
        "compressed_cparent_to_root_path": compressed,
        "self_category": self_cat,
        "parent_category": parent_cat,
        "left_category": left_cat,
        "right_category": right_cat,
        "right_contains_VP": int(right_vp),
        "conn_self_category": conn + "|" + self_cat,
        "conn_parent_category": conn + "|" + parent_cat,
        "conn_left_category": conn + "|" + left_cat,
        "conn_right_category": conn + "|" + right_cat,
        "self_category_parent_category": self_cat + "|" + parent_cat,
        "self_category_right_category": self_cat + "|" + right_cat,
        "self_category_left_category": self_cat + "|" + left_cat,
        "parent_category_left_category": parent_cat + "|" + left_cat,
        "parent_category_right_category": parent_cat + "|" + right_cat,
        "left_category_right_category": left_cat + "|" + right_cat,
        "conn_lower": conn.lower(),
        "conn": conn,
        "cparent_to_root_path_node_name": node_names,
        "conn_right_ctx": conn + "|" + right_ctx,
        "conn_parent_ctx": conn + "|" + parent_ctx,
    }


def merge_feature_vector(strings: dict, vocab: dict, families) -> tuple:
    """(dimension, {global_index: value}) — the reference's sparse merge
    (Feature.get_feature_by_feat/_list + merge_features) over per-family
    vocab dicts {family: {string: local_index}}."""
    feat = {}
    offset = 0
    for family, kind in families:
        if kind == "raw":
            feat[offset] = strings[family]
            offset += 1
            continue
        v = vocab.get(family, {})
        if kind == "feat":
            idx = v.get(strings[family], -1)
            if idx != -1:
                feat[offset + idx] = 1
        else:
            for s in strings[family]:
                idx = v.get(s, -1)
                if idx != -1:
                    feat[offset + idx] = 1
        offset += len(v)
    return offset, feat


def connective_feature_vector(strings: dict, vocab: dict) -> tuple:
    return merge_feature_vector(strings, vocab, CONNECTIVE_FEATURE_FAMILIES)


# D3 ArgumentPositionClassifier feature families
# (discourse_parser.py:812-915) — SS-vs-PS featurizer; the LR model that
# consumes them is pickled (absent in-sandbox)
ARGPOS_FEATURE_FAMILIES = (
    ("conn", "feat"), ("conn_part", "feat"), ("cpos", "feat"),
    ("prev1", "feat"), ("prev1pos", "feat"), ("prev1_conn", "feat"),
    ("prev1pos_cpos", "feat"), ("prev2", "feat"), ("prev2pos", "feat"),
    ("prev2_conn", "feat"), ("prev2pos_cpos", "feat"),
    ("next1pos_cpos", "feat"), ("next2", "feat"),
    ("conn_to_root_path", "feat"),
)


def _adjacent2(doc_parsed, sent_idx, idx, step):
    """Two steps of prev/next with sentence-boundary crossing, returning
    ((tok1, pos1), (tok2, pos2)) with NONE sentinels — mirrors the nested
    get_prev/next_token_index chains (discourse_parser.py:836-880)."""
    s, i = sent_idx, idx
    out = []
    for _ in range(2):
        if step < 0:
            if i - 1 >= 0:
                i -= 1
            elif s - 1 >= 0:
                s -= 1
                i = len(doc_parsed[s]["tokens"]) - 1
            else:
                out.append(("NONE", "NONE"))
                break
        else:
            if i + 1 < len(doc_parsed[s]["tokens"]):
                i += 1
            elif s + 1 < len(doc_parsed):
                s += 1
                i = 0
            else:
                out.append(("NONE", "NONE"))
                break
        out.append((doc_parsed[s]["tokens"][i], doc_parsed[s]["pos_tags"][i]))
    while len(out) < 2:
        out.append(("NONE", "NONE"))
    return out[0], out[1]


def argument_position_feature_strings(doc_parsed, sent_idx, indices,
                                      syntax_tree):
    """Raw values for the 14 D3 families (discourse_parser.py:812-915):
    connective position bucket, two-token lexical context either side, and
    the leaf-to-root constituency paths."""
    sp = doc_parsed[sent_idx]
    sent_len = len(sp["tokens"])
    conn = " ".join(sp["tokens"][i] for i in indices)
    cpos = "_".join(sp["pos_tags"][i] for i in indices)
    conn_part = "middle"
    if indices[0] / sent_len <= 0.2:
        conn_part = "start"
    elif indices[0] / sent_len >= 0.8:
        conn_part = "end"
    (prev1, prev1pos), (prev2, prev2pos) = _adjacent2(
        doc_parsed, sent_idx, indices[0], -1)
    (next1, next1pos), (next2, next2pos) = _adjacent2(
        doc_parsed, sent_idx, indices[-1], +1)
    try:
        paths = []
        for i in indices:
            leaf = syntax_tree.get_leaf_node_by_token_index(i)
            paths.append(syntax_tree.get_node_path_to_root(leaf))
        conn_to_root_path = "&".join(paths)
    except Exception:
        conn_to_root_path = "NONE_TREE"
    return {
        "conn": conn, "conn_part": conn_part, "cpos": cpos,
        "prev1": prev1, "prev1pos": prev1pos,
        "prev1_conn": prev1 + "|" + conn,
        "prev1pos_cpos": prev1pos + "|" + cpos,
        "prev2": prev2, "prev2pos": prev2pos,
        "prev2_conn": prev2 + "|" + conn,
        "prev2pos_cpos": prev2pos + "|" + cpos,
        "next1pos_cpos": cpos + "|" + next1pos,
        "next2": next2,
        "conn_to_root_path": conn_to_root_path,
    }


# D6 ExplicitSenseClassifier feature families
# (discourse_parser.py:1830-1999) — 23 families over connective + Pitler
# categories + the as/when previous-connective quirks; the softmax model
# that consumes them is pickled (absent in-sandbox; CONNECTIVE_SENSES is
# the deterministic stand-in)
EXPLICIT_FEATURE_FAMILIES = (
    ("conn", "feat"), ("cpos", "feat"), ("prev_conn", "feat"),
    ("conn_lower", "feat"), ("self_category", "feat"),
    ("parent_category", "feat"), ("left_category", "feat"),
    ("right_category", "feat"), ("conn_lower_self_category", "feat"),
    ("conn_lower_parent_category", "feat"),
    ("conn_lower_left_category", "feat"),
    ("conn_lower_right_category", "feat"),
    ("self_category_parent_category", "feat"),
    ("self_category_right_category", "feat"),
    ("self_category_left_category", "feat"),
    ("parent_category_left_category", "feat"),
    ("parent_category_right_category", "feat"),
    ("left_category_right_category", "feat"),
    ("conn_parent_ctx", "feat"), ("as_prev_conn", "feat"),
    ("as_prev_cpos", "feat"), ("when_prev_conn", "feat"),
    ("when_prev_cpos", "feat"),
)


def _pitler_categories(indices, syntax_tree):
    """(self, parent, left, right, parent_ctx) with the reference's
    sentinel conventions; shared by the D2/D6 feature generators."""
    node = syntax_tree.get_self_category_node_by_token_indices(indices)
    self_cat = node.name
    parent = node.up
    left = right = None
    if parent is not None:
        parent_cat = parent.name
        children = parent.get_children()
        for ci, child in enumerate(children):
            if child is node:
                if ci > 0:
                    left = children[ci - 1]
                if ci < len(children) - 1:
                    right = children[ci + 1]
        left_cat = left.name if left is not None else "NONE"
        right_cat = right.name if right is not None else "NONE"
        parent_ctx = "-".join(
            [parent.name, parent.up.name if parent.up is not None else "NULL"]
            + [c.name for c in parent.get_children()])
    else:
        parent_cat, left_cat, right_cat = "ROOT", "NONE", "NONE"
        parent_ctx = "None"
    return self_cat, parent_cat, left_cat, right_cat, parent_ctx


def _prev_conn_quirk(sp, indices, word):
    """The reference's as/when previous-connective features
    (discourse_parser.py:1898-1928): connective string of the LAST
    candidate before the connective, pos string of the FIRST candidate's
    indices — quirk preserved."""
    conn = " ".join(sp["tokens"][i] for i in indices)
    if conn != word:
        return f"NOT_{word}", f"NOT_{word}"
    prev_tokens = [sp["tokens"][i] for i in range(0, indices[0])]
    cands = sorted(extract_connective_candidates(prev_tokens),
                   key=lambda x: x["indices"][-1])
    if not cands:
        return "NULL", "NULL"
    prev_conn = cands[-1]["connective"]
    prev_cpos = " ".join(sp["pos_tags"][i] for i in cands[0]["indices"])
    return prev_conn, prev_cpos


def explicit_sense_feature_strings(doc_parsed, sent_idx, indices,
                                   syntax_tree):
    """Raw values for the 23 D6 families (discourse_parser.py:1830-1999)."""
    sp = doc_parsed[sent_idx]
    conn = " ".join(sp["tokens"][i] for i in indices)
    conn_lower = conn.lower()
    cpos = "_".join(sp["pos_tags"][i] for i in indices)
    prev, _ = _adjacent_token(doc_parsed, sent_idx, indices[0], -1)
    try:
        self_cat, parent_cat, left_cat, right_cat, parent_ctx = \
            _pitler_categories(indices, syntax_tree)
    except Exception:
        self_cat = parent_cat = left_cat = right_cat = "NONE_TREE"
        parent_ctx = "NONE_TREE"
    as_prev_conn, as_prev_cpos = _prev_conn_quirk(sp, indices, "as")
    when_prev_conn, when_prev_cpos = _prev_conn_quirk(sp, indices, "when")
    return {
        "conn": conn, "cpos": cpos, "prev_conn": prev + "|" + conn,
        "conn_lower": conn_lower,
        "self_category": self_cat, "parent_category": parent_cat,
        "left_category": left_cat, "right_category": right_cat,
        "conn_lower_self_category": conn_lower + "|" + self_cat,
        "conn_lower_parent_category": conn_lower + "|" + parent_cat,
        "conn_lower_left_category": conn_lower + "|" + left_cat,
        "conn_lower_right_category": conn_lower + "|" + right_cat,
        "self_category_parent_category": self_cat + "|" + parent_cat,
        "self_category_right_category": self_cat + "|" + right_cat,
        "self_category_left_category": self_cat + "|" + left_cat,
        "parent_category_left_category": parent_cat + "|" + left_cat,
        "parent_category_right_category": parent_cat + "|" + right_cat,
        "left_category_right_category": left_cat + "|" + right_cat,
        "conn_parent_ctx": conn + "|" + parent_ctx,
        "as_prev_conn": as_prev_conn, "as_prev_cpos": as_prev_cpos,
        "when_prev_conn": when_prev_conn, "when_prev_cpos": when_prev_cpos,
    }


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


def _clause_mentions(mentions, clause):
    """Project sentence-level mention spans into clause-local coordinates
    (eventuality_extractor.py:634-648 bisect semantics)."""
    import bisect

    out = []
    n = len(clause)
    for m in mentions or ():
        s = bisect.bisect_left(clause, m["start"])
        if not (s < n and clause[s] == m["start"]):
            continue
        e = bisect.bisect_left(clause, m["end"] - 1)
        if not (e < n and clause[e] == m["end"] - 1):
            continue
        out.append(dict(m, start=s, end=e + 1))
    return out


def extract_sentence_eventualities_discourse(tokens, lemmas, pos_tags,
                                             dependencies, syntax_tree=None,
                                             use_lemma=True, ners=None,
                                             mentions=None):
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
            ners=c_ners, mentions=_clause_mentions(mentions, list(clause)))
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
