"""Rank/select over device tensors.

TPU-native replacement for the reference's succinct bit-vector / wavelet
tree hierarchy (metagraph/src/common/vectors/bit_vector.hpp:12,
wavelet_tree.hpp:13). The reference optimizes for *space* with
rank-support samples and pointer-heavy wavelet trees; on TPU the winning
trade is *dense prefix-sum tables* + batched gathers:

  * ``rank(i)`` = one gather from a cumulative-count table;
  * ``select(r)`` = one vectorized binary search (searchsorted) over the
    same monotone table;
  * per-symbol ranks over a small alphabet (the BOSS W array, sigma<=10)
    = one gather from an (N+1, sigma) table.

Cost: O(4·sigma) bytes/position instead of o(1) extra bits — deliberate:
HBM capacity is traded for strictly gather-shaped queries, which is what
the hardware does at full bandwidth. A blocked variant (prefix per 2^b
block + in-block popcount) is the planned compression step and keeps the
same API.

All query methods are batched: they take (Q,) index tensors.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BitRank:
    """Rank/select over a boolean vector via a dense inclusive prefix table.

    prefix[i] = popcount(bits[0..i-1]);  len(prefix) = n+1.
    """
    prefix: jax.Array  # (n+1,) int32
    n: int

    @staticmethod
    def build(bits: jax.Array) -> "BitRank":
        prefix = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(bits.astype(jnp.int32)),
        ])
        return BitRank(prefix=prefix, n=bits.shape[0])

    @property
    def num_set(self) -> jax.Array:
        return self.prefix[self.n]

    def rank1(self, i: jax.Array) -> jax.Array:
        """#ones in bits[0..i] (inclusive, like bit_vector::rank1)."""
        i = jnp.clip(i, -1, self.n - 1)
        return self.prefix[i + 1]

    def rank0(self, i: jax.Array) -> jax.Array:
        return i + 1 - self.rank1(i)

    def select1(self, r: jax.Array) -> jax.Array:
        """Position of the r-th one (1-based r), as in bit_vector::select1."""
        return jnp.searchsorted(self.prefix, r, side="left") - 1

    def next1(self, i: jax.Array) -> jax.Array:
        """Smallest j >= i with bits[j] set, else n (reference next1)."""
        r = self.rank1(i - 1) + 1
        pos = self.select1(r)
        return jnp.where(r <= self.num_set, pos, self.n)

    def prev1(self, i: jax.Array) -> jax.Array:
        """Largest j <= i with bits[j] set, else n (reference prev1)."""
        r = self.rank1(i)
        return jnp.where(r > 0, self.select1(r), self.n)


@dataclass(frozen=True)
class SymbolRank:
    """Per-symbol rank/select over a small-alphabet sequence (wavelet-tree
    replacement for the BOSS W array).

    prefix[i, c] = #occurrences of c in seq[0..i-1]; shape (n+1, sigma).
    """
    prefix: jax.Array   # (n+1, sigma) int32
    seq: jax.Array      # (n,) int32 — kept for direct access
    sigma: int

    @staticmethod
    def build(seq: jax.Array, sigma: int) -> "SymbolRank":
        onehot = jax.nn.one_hot(seq.astype(jnp.int32), sigma, dtype=jnp.int32)
        prefix = jnp.concatenate([
            jnp.zeros((1, sigma), jnp.int32),
            jnp.cumsum(onehot, axis=0),
        ])
        return SymbolRank(prefix=prefix, seq=seq.astype(jnp.int32), sigma=sigma)

    @property
    def n(self) -> int:
        return self.seq.shape[0]

    def rank(self, c: jax.Array, i: jax.Array) -> jax.Array:
        """#occurrences of symbol c in seq[0..i] (inclusive)."""
        i = jnp.clip(i, -1, self.n - 1)
        return self.prefix[i + 1, c]

    def select(self, c: jax.Array, r: jax.Array) -> jax.Array:
        """Position of the r-th (1-based) occurrence of c.

        Vectorized binary search on the per-symbol prefix column; handles a
        batch of (c, r) pairs with log2(n) gather rounds.
        """
        n = self.n
        q = jnp.broadcast_arrays(c, r)
        c, r = q[0], q[1]
        steps = max(1, int(np.ceil(np.log2(n + 2))))
        lo = jnp.zeros_like(r)          # invariant: prefix[lo, c] < r
        hi = jnp.full_like(r, n)

        def body(_, state):
            lo, hi = state
            mid = (lo + hi + 1) >> 1
            go_up = self.prefix[mid, c] < r
            lo = jnp.where(go_up, mid, lo)
            hi = jnp.where(go_up, hi, mid - 1)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, steps, lambda s, st: body(s, st), (lo, hi))
        # prefix[lo, c] < r <= prefix[lo+1, c]  ->  occurrence at position lo
        return lo

    def __getitem__(self, i):
        return self.seq[i]


def register_pytrees():
    jax.tree_util.register_dataclass(BitRank, ["prefix"], ["n"])
    jax.tree_util.register_dataclass(SymbolRank, ["prefix", "seq"], ["sigma"])


register_pytrees()
