"""Multi-BRWT: hierarchical column-grouped binary matrix.

Re-design of the reference Multi-BRWT
(metagraph/src/annotation/binary_matrix/multi_brwt/brwt.hpp:18-75,
brwt_builders.hpp:18-59, clustering.hpp:27-48). Structure is the same —
a tree whose every node stores the OR ("nonzero rows") bitvector of its
column subset over the rows of its parent's support, with leaves owning
single columns — but both construction and querying are reshaped for TPU:

  * column clustering: pairwise similarity of subsampled columns is a
    bit-matrix product — computed as one (num_cols, R) x (R, num_cols)
    matmul on the MXU instead of per-pair popcount loops;
  * query descent: one level at a time for a whole batch of query rows —
    per level, the surviving (query, node) pairs gather their node
    bitvector bit and rank-map their row into the child's support; all
    gathers, no recursion.

Node bitvectors are stored as dense rank-prefix arrays (BitRank), the
same space/bandwidth trade as the rest of the framework.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common.ranksel import BitRank
from .matrix import RowSparse


@dataclass
class BrwtNode:
    """One tree node: support bitvector over parent's support rows."""
    prefix: np.ndarray           # (n_local + 1,) int64 rank prefix
    children: List["BrwtNode"]
    column: int = -1             # leaf: original column id

    @property
    def n_local(self) -> int:
        return len(self.prefix) - 1

    @property
    def num_set(self) -> int:
        return int(self.prefix[-1])


@dataclass
class Brwt:
    root_children: List[BrwtNode]
    root_prefix: np.ndarray      # rank prefix over all rows (root support)
    num_rows: int
    num_cols: int

    # -- stats (reference print_brwt_stats, stats.cpp) ---------------------

    def num_nodes(self) -> int:
        def count(n):
            return 1 + sum(count(c) for c in n.children)
        return 1 + sum(count(c) for c in self.root_children)

    def avg_arity(self) -> float:
        internal, edges = [0], [0]

        def walk(children):
            if not children:
                return
            internal[0] += 1
            edges[0] += len(children)
            for c in children:
                walk(c.children)
        walk(self.root_children)
        return edges[0] / internal[0] if internal[0] else 0.0

    # -- queries -----------------------------------------------------------

    def get_rows_dense(self, rows: np.ndarray) -> np.ndarray:
        """(Q, num_cols) bool presence — batched level-order descent."""
        rows = np.asarray(rows, np.int64)
        out = np.zeros((len(rows), self.num_cols), bool)
        # root support: map global rows into root-local indices
        bit = self.root_prefix[rows + 1] - self.root_prefix[rows]
        alive = bit > 0
        local = self.root_prefix[rows + 1] - 1   # rank - 1
        stack = [(c, rows, local, alive) for c in self.root_children]
        while stack:
            node, qrows, local, alive = stack.pop()
            p = node.prefix
            bit = np.zeros(len(qrows), np.int64)
            li = np.clip(local, 0, node.n_local - 1)
            bit[alive] = (p[li + 1] - p[li])[alive]
            hit = alive & (bit > 0)
            if not hit.any():
                continue
            child_local = p[li + 1] - 1
            if node.column >= 0 and not node.children:
                out[hit, node.column] = True
                continue
            for c in node.children:
                stack.append((c, qrows, child_local, hit))
        return out

    def sum_rows(self, rows, weights) -> np.ndarray:
        dense = self.get_rows_dense(np.asarray(rows))
        return (dense * np.asarray(weights)[:, None]).sum(axis=0)

    def presence(self, rows) -> np.ndarray:
        """RowSparse-compatible query API (engine/annotated_dbg)."""
        return self.get_rows_dense(np.asarray(rows))

    @property
    def nnz(self) -> int:
        def leaf_sum(n):
            if n.column >= 0 and not n.children:
                return n.num_set
            return sum(leaf_sum(c) for c in n.children)
        return sum(leaf_sum(c) for c in self.root_children)

    def get_rows(self, rows: np.ndarray) -> List[List[int]]:
        dense = self.get_rows_dense(rows)
        return [list(np.nonzero(r)[0]) for r in dense]

    def to_row_sparse(self) -> RowSparse:
        chunks_r, chunks_c = [], []
        B = 1 << 16
        for s in range(0, self.num_rows, B):
            rows = np.arange(s, min(s + B, self.num_rows))
            dense = self.get_rows_dense(rows)
            r, c = np.nonzero(dense)
            chunks_r.append(r + s)
            chunks_c.append(c)
        return RowSparse.from_coo(np.concatenate(chunks_r),
                                  np.concatenate(chunks_c),
                                  self.num_rows, self.num_cols)

    # -- serialization -----------------------------------------------------

    def to_npz_dict(self) -> dict:
        flat: List[dict] = []

        def emit(node, parent):
            idx = len(flat)
            flat.append({"prefix": node.prefix, "parent": parent,
                         "column": node.column})
            for c in node.children:
                emit(c, idx)
        for c in self.root_children:
            emit(c, -1)
        d = {"brwt_root_prefix": self.root_prefix,
             "brwt_shape": np.array([self.num_rows, self.num_cols]),
             "brwt_parents": np.array([f["parent"] for f in flat], np.int64),
             "brwt_columns": np.array([f["column"] for f in flat], np.int64),
             "brwt_prefix_lens": np.array([len(f["prefix"]) for f in flat],
                                          np.int64),
             "brwt_prefix_concat": (np.concatenate(
                 [f["prefix"] for f in flat]) if flat
                 else np.zeros(0, np.int64))}
        return d

    @staticmethod
    def from_npz_dict(d) -> "Brwt":
        shape = d["brwt_shape"]
        parents = d["brwt_parents"]
        columns = d["brwt_columns"]
        lens = d["brwt_prefix_lens"]
        concat = d["brwt_prefix_concat"]
        nodes: List[BrwtNode] = []
        off = 0
        for i in range(len(parents)):
            prefix = concat[off:off + lens[i]]
            off += lens[i]
            nodes.append(BrwtNode(prefix=np.asarray(prefix), children=[],
                                  column=int(columns[i])))
        root_children = []
        for i, par in enumerate(parents):
            if par < 0:
                root_children.append(nodes[i])
            else:
                nodes[par].children.append(nodes[i])
        return Brwt(root_children=root_children,
                    root_prefix=np.asarray(d["brwt_root_prefix"]),
                    num_rows=int(shape[0]), num_cols=int(shape[1]))


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def _column_bitmaps(matrix: RowSparse) -> List[np.ndarray]:
    """Per-column sorted row-index arrays."""
    rows = np.asarray(matrix.rows)
    cols = np.asarray(matrix.cols)
    out = []
    for c in range(matrix.num_cols):
        out.append(np.sort(rows[cols == c]))
    return out


def greedy_linkage(columns: List[np.ndarray], num_rows: int,
                   subsample: int = 1_000_000,
                   seed: int = 0) -> List[Tuple[int, int]]:
    """Greedy similarity pairing (reference greedy_matching /
    agglomerative_greedy_linkage, clustering.cpp). Similarity of two
    columns = popcount of AND over subsampled rows — computed for ALL
    pairs at once as S = M @ M.T with M the (cols, rows) 0/1 matrix, an
    MXU matmul instead of the reference's per-pair word loops."""
    n = len(columns)
    if n <= 1:
        return []
    rng = np.random.default_rng(seed)
    if num_rows > subsample:
        keep = np.sort(rng.choice(num_rows, subsample, replace=False))
    else:
        keep = np.arange(num_rows)
    M = np.zeros((n, len(keep)), np.float32)
    for i, col in enumerate(columns):
        mask = np.isin(keep, col, assume_unique=True)
        M[i, mask] = 1.0
    S = np.array(jnp.asarray(M) @ jnp.asarray(M).T)  # MXU similarity (writable copy)
    np.fill_diagonal(S, -1.0)
    pairs = []
    used = np.zeros(n, bool)
    # greedy max-similarity matching
    order = np.dstack(np.unravel_index(np.argsort(-S, axis=None),
                                       S.shape))[0]
    for i, j in order:
        if i < j and not used[i] and not used[j]:
            pairs.append((int(i), int(j)))
            used[i] = used[j] = True
        if used.sum() >= n - 1:
            break
    return pairs


def build_brwt(matrix: RowSparse, arity: int = 2,
               subsample: int = 1_000_000) -> Brwt:
    """Bottom-up Multi-BRWT build (BRWTBottomUpBuilder semantics):
    greedily pair similar columns level by level until one root."""
    num_rows, num_cols = matrix.num_rows, matrix.num_cols
    col_rows = _column_bitmaps(matrix)

    # current level: list of (support_rows_global_sorted, node)
    def leaf(c):
        return (col_rows[c], None, c)

    level = [leaf(c) for c in range(num_cols)]
    # materialize leaves lazily: a node's prefix depends on its parent
    # support, so build top-down after the merge tree is known. First
    # construct the merge tree over column groups:
    trees: List = [("leaf", c) for c in range(num_cols)]
    supports: List[np.ndarray] = [col_rows[c] for c in range(num_cols)]
    while len(trees) > 1:
        pairs = greedy_linkage(supports, num_rows, subsample)
        if not pairs:
            pairs = [(i, i + 1) for i in range(0, len(trees) - 1, 2)]
        merged_trees, merged_supports = [], []
        used = set()
        for i, j in pairs:
            merged_trees.append(("node", trees[i], trees[j]))
            merged_supports.append(
                np.union1d(supports[i], supports[j]))
            used.add(i)
            used.add(j)
        for i in range(len(trees)):
            if i not in used:
                merged_trees.append(trees[i])
                merged_supports.append(supports[i])
        trees, supports = merged_trees, merged_supports

    root_support = supports[0] if supports else np.zeros(0, np.int64)
    root_bits = np.zeros(num_rows, bool)
    root_bits[root_support] = True
    root_prefix = np.concatenate([[0], np.cumsum(root_bits)]).astype(np.int64)

    def build_node(tree, parent_support: np.ndarray) -> BrwtNode:
        if tree[0] == "leaf":
            c = tree[1]
            support = col_rows[c]
        else:
            support = collect_support(tree)
        bits = np.isin(parent_support, support, assume_unique=True)
        prefix = np.concatenate([[0], np.cumsum(bits)]).astype(np.int64)
        if tree[0] == "leaf":
            return BrwtNode(prefix=prefix, children=[], column=tree[1])
        node = BrwtNode(prefix=prefix, children=[], column=-1)
        node.children = [build_node(t, support) for t in tree[1:]]
        return node

    support_cache: Dict[int, np.ndarray] = {}

    def collect_support(tree) -> np.ndarray:
        key = id(tree)
        if key in support_cache:
            return support_cache[key]
        if tree[0] == "leaf":
            s = col_rows[tree[1]]
        else:
            s = np.zeros(0, np.int64)
            for t in tree[1:]:
                s = np.union1d(s, collect_support(t))
        support_cache[key] = s
        return s

    if not trees:
        return Brwt(root_children=[], root_prefix=root_prefix,
                    num_rows=num_rows, num_cols=num_cols)
    root_tree = trees[0]
    if root_tree[0] == "leaf":
        children = [build_node(root_tree, root_support)]
    else:
        children = [build_node(t, root_support) for t in root_tree[1:]]
    return Brwt(root_children=children, root_prefix=root_prefix,
                num_rows=num_rows, num_cols=num_cols)


def relax_brwt(brwt: Brwt, max_arity: int = 8) -> Brwt:
    """Arity relaxation (reference BRWTOptimizer / `relax_brwt` CLI):
    collapse chains of internal nodes into wider nodes up to max_arity,
    re-ranking child bitvectors into the grandparent's support."""

    def relax(node: BrwtNode) -> BrwtNode:
        node.children = [relax(c) for c in node.children]
        # merge a child into this node when total arity stays in bounds
        changed = True
        while changed:
            changed = False
            for i, c in enumerate(node.children):
                if c.column < 0 and c.children and \
                        len(node.children) - 1 + len(c.children) <= max_arity:
                    # child c's children see c's support; lift to node's
                    # support: compose rank prefixes
                    lifted = []
                    set_pos = np.nonzero(np.diff(c.prefix) > 0)[0]
                    for gc in c.children:
                        bits = np.zeros(c.n_local, bool)
                        gbits = np.diff(gc.prefix) > 0
                        bits[set_pos] = gbits
                        prefix = np.concatenate(
                            [[0], np.cumsum(bits)]).astype(np.int64)
                        lifted.append(BrwtNode(prefix=prefix,
                                               children=gc.children,
                                               column=gc.column))
                    node.children = (node.children[:i] + lifted
                                     + node.children[i + 1:])
                    changed = True
                    break
        return node

    fake_root = BrwtNode(prefix=brwt.root_prefix.astype(np.int64),
                         children=brwt.root_children, column=-1)
    relaxed = relax(fake_root)
    return Brwt(root_children=relaxed.children,
                root_prefix=brwt.root_prefix,
                num_rows=brwt.num_rows, num_cols=brwt.num_cols)
