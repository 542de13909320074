"""From-scratch constituency tree (the reference's SyntaxTree, D1).

Behavioral contract mirrored from
/root/reference/aser/extract/discourse_parser.py:103-222 (which wraps an
ete3 newick tree): leaves are the sentence tokens in order, each carrying
its token ``index``; internal nodes carry constituent labels; subtree
extraction by token indices prunes to the nodes on paths to kept leaves
while PRESERVING original leaf indices.  Implemented directly over a PTB
bracket string — no newick conversion, no ete3.

The ops exposed are the ones the discourse pipeline consumes:
``get_clauses`` (SBAR splitting) needs traverse/get_leaves/subtree;
the connective/argument feature extractors (D2+) need self/parent/sibling
category nodes and root paths.
"""

from __future__ import annotations

__all__ = ["SyntaxNode", "SyntaxTree"]


class SyntaxNode:
    __slots__ = ("name", "children", "up", "index", "_leafidx")

    def __init__(self, name: str, up: "SyntaxNode | None" = None):
        self.name = name
        self.children: list[SyntaxNode] = []
        self.up = up
        self.index: int | None = None  # token index, leaves only
        self._leafidx = None  # cached sorted leaf-index tuple (write-once)

    def leaf_indices(self):
        """Sorted token indices under this node, cached write-once.  Trees
        are parse-memo residents shared across every occurrence of a
        sentence, so each node computes this ONCE per unique sentence —
        D4/D5 walk candidate constituents per connective otherwise
        re-collecting the same leaf lists.  Only valid after leaf indices
        are assigned (SyntaxTree init) and the tree is frozen, which holds
        for all kernel consumers."""
        cached = self._leafidx
        if cached is None:
            out = []
            stack = [self]
            while stack:
                node = stack.pop()
                if node.children:
                    stack.extend(node.children)
                else:
                    out.append(node.index)
            out.sort()
            cached = self._leafidx = tuple(out)
        return cached

    def is_leaf(self) -> bool:
        return not self.children

    def is_root(self) -> bool:
        return self.up is None

    def get_children(self):
        return list(self.children)

    def traverse(self):
        """LEVELORDER traversal including self — ete3's default strategy,
        which the reference's SBAR scan iterates with; preserving it keeps
        the which-SBAR-splits-first tie-break identical."""
        from collections import deque

        q = deque([self])
        while q:
            node = q.popleft()
            yield node
            q.extend(node.children)

    def _preorder(self):
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    def get_leaves(self):
        """Leaves in left-to-right (document) order, as ete3 returns them.
        Inline iterative walk — no generator frames on the hot path."""
        out = []
        stack = [self]
        pop = stack.pop
        while stack:
            node = pop()
            ch = node.children
            if ch:
                stack.extend(reversed(ch))
            else:
                out.append(node)
        return out

    def get_descendants(self):
        """All nodes strictly below this one (ete3 surface), preorder."""
        out = []
        stack = list(reversed(self.children))
        pop = stack.pop
        while stack:
            node = pop()
            out.append(node)
            stack.extend(reversed(node.children))
        return out


def _tokenize_ptb(s: str):
    out, cur = [], []
    for ch in s:
        if ch in "()":
            if cur:
                out.append("".join(cur))
                cur = []
            out.append(ch)
        elif ch.isspace():
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


class SyntaxTree:
    """PTB-bracket constituency tree; ``tree`` is the root SyntaxNode or
    None when the string is empty/unparseable (the reference's None-tree
    contract — consumers degrade gracefully)."""

    def __init__(self, parse_tree: str = "()"):
        self.tree = self._parse(parse_tree) if parse_tree else None
        self.leaves = self.tree.get_leaves() if self.tree is not None else []
        for idx, leaf in enumerate(self.leaves):
            leaf.index = idx

    @classmethod
    def from_root(cls, root: "SyntaxNode | None") -> "SyntaxTree":
        """Wrap an already-built node structure (the parser constructs
        nodes directly and renders the bracket string FROM them, so the
        two can never diverge) — skips the string round-trip on the
        discourse hot path."""
        self = cls.__new__(cls)
        self.tree = root
        self.leaves = root.get_leaves() if root is not None else []
        for idx, leaf in enumerate(self.leaves):
            leaf.index = idx
        return self

    @staticmethod
    def _parse(s: str):
        toks = _tokenize_ptb(s)
        if not toks:
            return None
        root = None
        stack: list[SyntaxNode] = []
        i = 0
        n = len(toks)
        while i < n:
            t = toks[i]
            if t == "(":
                # next token is the label (may be absent for bare "()")
                label = ""
                if i + 1 < n and toks[i + 1] not in "()":
                    label = toks[i + 1]
                    i += 1
                node = SyntaxNode(label, stack[-1] if stack else None)
                if stack:
                    stack[-1].children.append(node)
                stack.append(node)
            elif t == ")":
                if not stack:
                    return None
                closed = stack.pop()
                if not stack:
                    root = closed if root is None else root
            else:
                # bare word inside a preterminal: becomes a leaf child
                if stack:
                    leaf = SyntaxNode(t, stack[-1])
                    stack[-1].children.append(leaf)
            i += 1
        if root is None or (not root.children and not root.name):
            return None
        return root

    # ---- reference-surface ops (discourse_parser.py:126-222) -------------

    def get_leaf_node_by_token_index(self, token_index: int):
        if token_index < len(self.leaves):
            return self.leaves[token_index]
        return None

    def get_node_path_to_root(self, node: SyntaxNode) -> str:
        parts = []
        while not node.is_root():
            parts.append(node.name)
            node = node.up
        parts.append(node.name)
        return "-->".join(parts)

    def get_common_ancestor_by_token_indices(self, token_indices):
        len_leaves = len(self.leaves)
        leaves = [self.leaves[i] for i in token_indices if i < len_leaves]
        if not leaves:
            return None
        if len(leaves) == 1:
            return leaves[0]
        # ancestor-set intersection walk
        paths = []
        for leaf in leaves:
            p, node = [], leaf
            while node is not None:
                p.append(node)
                node = node.up
            paths.append(p[::-1])  # root..leaf
        anc = None
        for depth in range(min(len(p) for p in paths)):
            node = paths[0][depth]
            if all(p[depth] is node for p in paths):
                anc = node
            else:
                break
        return anc

    def get_self_category_node_by_token_indices(self, token_indices):
        if len(token_indices) == 1:
            leaf = self.get_leaf_node_by_token_index(token_indices[0])
            return leaf.up if leaf is not None else None
        return self.get_common_ancestor_by_token_indices(token_indices)

    def _sibling(self, token_indices, offset: int):
        node = self.get_self_category_node_by_token_indices(token_indices)
        if node is None or node.up is None:
            return None
        children = node.up.children
        idx = children.index(node) + offset
        if 0 <= idx < len(children):
            return children[idx]
        return None

    def get_left_sibling_category_node_by_token_indices(self, token_indices):
        return self._sibling(token_indices, -1)

    def get_right_sibling_category_node_by_token_indices(self, token_indices):
        return self._sibling(token_indices, +1)

    def get_parent_category_node_by_token_indices(self, token_indices):
        node = self.get_self_category_node_by_token_indices(token_indices)
        return node.up if node is not None else None

    def get_siblings(self, node: SyntaxNode):
        """All siblings of ``node`` (discourse_parser.py:337-343)."""
        if node.is_root():
            return []
        return [c for c in node.up.children if c is not node]

    @staticmethod
    def _node_common_ancestor(node1: SyntaxNode, node2: SyntaxNode):
        anc = set()
        n = node1
        while n is not None:
            anc.add(id(n))
            n = n.up
        n = node2
        while n is not None:
            if id(n) in anc:
                return n
            n = n.up
        return None

    def get_node_to_node_path(self, node1: SyntaxNode, node2: SyntaxNode) -> str:
        """node1 up to the common ancestor then down to node2, '>' on the
        way up and '<' on the way down (discourse_parser.py:366-384)."""
        ca = self._node_common_ancestor(node1, node2)
        path = ""
        temp = node1
        while temp is not ca:
            path += temp.name + ">"
            temp = temp.up
        path += ca.name
        down = ""
        temp = node2
        while temp is not ca:
            down = "<" + temp.name + down
            temp = temp.up
        return path + down

    def get_relative_position(self, node1: SyntaxNode, node2: SyntaxNode) -> str:
        """Mirrors the reference EXACTLY — which, due to
        ``node1.is_root or node2.is_root`` (method object, always truthy,
        discourse_parser.py:345-346), ALWAYS returns "middle".  Preserved
        bug-for-bug because the downstream vocab dict only ever indexes
        what the reference produced."""
        return "middle"

    def get_subtree_by_token_indices(self, token_indices):
        """Pruned copy keeping only nodes on paths to the kept leaves;
        kept leaves RETAIN their original token index (the contract
        get_clauses' SBAR comparison relies on,
        discourse_parser.py:190-222)."""
        if self.tree is None:
            return self
        if isinstance(token_indices, (list, tuple)):
            token_indices = set(token_indices)
        if len(token_indices) == 0:
            return SyntaxTree("()")
        if len(token_indices) == len(self.leaves):
            return self

        keep = set()
        for idx, leaf in enumerate(self.leaves):
            if idx in token_indices:
                node = leaf
                while node is not None and id(node) not in keep:
                    keep.add(id(node))
                    node = node.up

        def clone(node, up):
            c = SyntaxNode(node.name, up)
            c.index = node.index
            for child in node.children:
                if id(child) in keep:
                    c.children.append(clone(child, c))
            return c

        sub = SyntaxTree("()")
        sub.tree = clone(self.tree, None)
        sub.leaves = sub.tree.get_leaves()
        return sub
