"""CanonicalDbg: present a PRIMARY graph as its canonical closure.

Re-design of the reference CanonicalDBG
(metagraph/src/graph/representation/canonical_dbg.hpp:21): a PRIMARY
graph stores one orientation per k-mer pair (the canonical form); the
wrapper exposes a virtual node space of size 2N where ids 1..N are the
stored orientation and N+1..2N their reverse complements, resolving
adjacency through the base graph with orientation bookkeeping. Where the
reference uses per-call LRU caches for child/parent resolution, every
operation here is batched over whole node tensors, so no caching layer
is needed.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..common import packed
from ..kmer import packing
from ..kmer.extractor import encode_sequences, window_validity
from .dbg_succinct import DbgSuccinct


@dataclass
class CanonicalDbg:
    base: DbgSuccinct

    @property
    def k(self) -> int:
        return self.base.k

    @property
    def alphabet(self):
        return self.base.alphabet

    @property
    def mode(self) -> str:
        return "canonical"

    def num_nodes(self) -> int:
        return 2 * int(self.base.valid_rank.num_set)

    # -- virtual node resolution -------------------------------------------

    def _N(self):
        # traced-safe base node count (usable inside jitted methods)
        return self.base.valid_rank.num_set

    def _resolve(self, lanes: jax.Array) -> jax.Array:
        """Packed (possibly non-canonical) k-mers -> virtual node ids."""
        B = self.alphabet.bits_per_char
        K = self.k
        rc = packing.reverse_complement(lanes, K, B, self.alphabet.complement)
        is_rc = packed.lt(rc, lanes)          # canonical form is the rc
        canon = jnp.where(is_rc[None, :], rc, lanes)
        edges = self.base.boss.map_to_edges(canon)
        v = self.base.edge_to_node(edges)
        return jnp.where(v > 0, jnp.where(is_rc, v + self._N(), v), 0)

    def node_lanes(self, nodes: jax.Array) -> jax.Array:
        """Packed k-mer of each virtual node (its own orientation)."""
        B = self.alphabet.bits_per_char
        K = self.k
        N = self._N()
        base_id = jnp.where(nodes > N, nodes - N, nodes)
        lanes = self.base.node_lanes(base_id)
        rc = packing.reverse_complement(lanes, K, B, self.alphabet.complement)
        return jnp.where((nodes > N)[None, :], rc, lanes)

    # -- mapping -----------------------------------------------------------

    @jax.jit
    def map_codes_to_nodes(self, codes: jax.Array) -> jax.Array:
        K = self.k
        B = self.alphabet.bits_per_char
        ok = window_validity(codes, K)
        lanes = packing.pack_windows(codes, K, B)
        return jnp.where(ok, self._resolve(lanes), 0)

    def map_to_nodes(self, seq) -> np.ndarray:
        from ..kmer.alphabets import INVALID_CODE
        codes = encode_sequences([seq], self.alphabet)[:-1]
        n = len(codes)
        if n < self.k:
            return np.zeros((max(0, n - self.k + 1),), np.int32)
        cap = max(64, 1 << (n - 1).bit_length())
        codes = np.concatenate(
            [codes, np.full(cap - n, INVALID_CODE, np.uint8)])
        out = np.asarray(self.map_codes_to_nodes(jnp.asarray(codes)))
        return out[:n - self.k + 1]

    # -- adjacency ---------------------------------------------------------

    @jax.jit
    def successors(self, nodes: jax.Array) -> jax.Array:
        B = self.alphabet.bits_per_char
        K = self.k
        lanes = self.node_lanes(nodes)
        shifted = packing.to_next(lanes, K, B, 0)
        cols = []
        for c in range(1, self.alphabet.size):
            q = packed.set_field(
                shifted, 0, jnp.full((shifted.shape[1],), c, jnp.uint32), B)
            cols.append(self._resolve(q))
        out = jnp.stack(cols, axis=1)
        return jnp.where((nodes > 0)[:, None], out, 0)

    @jax.jit
    def predecessors(self, nodes: jax.Array) -> jax.Array:
        B = self.alphabet.bits_per_char
        K = self.k
        lanes = self.node_lanes(nodes)
        cols = []
        for c in range(1, self.alphabet.size):
            q = packing.to_prev(lanes, K, B, c)
            cols.append(self._resolve(q))
        out = jnp.stack(cols, axis=1)
        return jnp.where((nodes > 0)[:, None], out, 0)

    def outdegree(self, nodes: jax.Array) -> jax.Array:
        return jnp.sum(self.successors(nodes) > 0, axis=1)

    def indegree(self, nodes: jax.Array) -> jax.Array:
        return jnp.sum(self.predecessors(nodes) > 0, axis=1)

    # -- decode ------------------------------------------------------------

    def node_kmers_chars(self, nodes: np.ndarray) -> np.ndarray:
        lanes = self.node_lanes(jnp.asarray(nodes))
        return np.asarray(packing.unpack_to_chars(
            lanes, self.k, self.alphabet.bits_per_char))

    def node_sequence(self, node: int) -> str:
        return self.alphabet.decode(
            self.node_kmers_chars(np.array([node]))[0])

    # -- annotation row mapping (reference: primary graphs annotate the
    #    base node, both orientations share the row) ------------------------

    def node_to_anno_row(self, nodes: np.ndarray) -> np.ndarray:
        N = int(self.base.valid_rank.num_set)
        nodes = np.asarray(nodes)
        base_id = np.where(nodes > N, nodes - N, nodes)
        return base_id.astype(np.int64) - 1


def register_pytrees():
    jax.tree_util.register_dataclass(CanonicalDbg, ["base"], [])


register_pytrees()
