"""MaskedDbg: restrict a graph to a node subset
(reference: metagraph/src/graph/representation/masked_graph.hpp:14).

Duck-types the DbgSuccinct traversal surface (num_nodes / successors /
predecessors / node_kmers_chars / map_to_nodes) with the mask applied, so
unitig extraction, cleaning and differential assembly run unchanged on
the restricted graph. Node ids keep the base graph's numbering (masked
nodes simply vanish from adjacency), matching the reference's design.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .dbg_succinct import DbgSuccinct


@dataclass
class MaskedDbg:
    base: DbgSuccinct
    mask: np.ndarray          # (N+1,) bool over base node ids

    @property
    def k(self) -> int:
        return self.base.k

    @property
    def alphabet(self):
        return self.base.alphabet

    @property
    def mode(self):
        return self.base.mode

    def num_nodes(self) -> int:
        return self.base.num_nodes()

    def num_masked_nodes(self) -> int:
        return int(self.mask[1:].sum())

    def _mask_ids(self, ids: jnp.ndarray) -> jnp.ndarray:
        m = jnp.asarray(self.mask)
        return jnp.where(m[ids], ids, 0)

    def map_to_nodes(self, seq) -> np.ndarray:
        nodes = self.base.map_to_nodes(seq)
        return np.where(self.mask[nodes], nodes, 0)

    def successors(self, nodes: jnp.ndarray) -> jnp.ndarray:
        m = jnp.asarray(self.mask)
        s = self.base.successors(nodes)
        s = jnp.where(m[s], s, 0)
        return jnp.where(m[nodes][:, None], s, 0)

    def predecessors(self, nodes: jnp.ndarray) -> jnp.ndarray:
        m = jnp.asarray(self.mask)
        p = self.base.predecessors(nodes)
        p = jnp.where(m[p], p, 0)
        return jnp.where(m[nodes][:, None], p, 0)

    def outdegree(self, nodes: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(self.successors(nodes) > 0, axis=1)

    def indegree(self, nodes: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(self.predecessors(nodes) > 0, axis=1)

    def node_kmers_chars(self, nodes: np.ndarray) -> np.ndarray:
        return self.base.node_kmers_chars(nodes)
