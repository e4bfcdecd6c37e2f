"""Graph serialization (.dbg files).

The reference serializes sdsl structures (dbg_succinct.cpp serialize);
we store the logical arrays in a single compressed npz container — the
on-disk format is engine-specific in both designs, while stats/query
outputs are the cross-implementation contract.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kmer.alphabets import ALPHABETS, Alphabet
from .boss import Boss
from .dbg_succinct import DbgSuccinct

GRAPH_EXT = ".dbg.npz"


def save_graph(path: str, graph: DbgSuccinct, state: str = "fast"):
    """state 'fast' keeps the packed edge-kmer search accelerator
    (~12 B/edge); 'small' drops it, leaving the blocked rank/select
    structures only (~2 B/edge — the reference's BOSS states role,
    boss.hpp:302-328)."""
    if not path.endswith(GRAPH_EXT):
        path = path + GRAPH_EXT
    boss = graph.boss
    d = dict(
        k=np.array(boss.k),
        alphabet=np.array(graph.alphabet.name),
        mode=np.array(graph.mode),
        W=np.asarray(boss.W).astype(np.int8),
        last=np.packbits(_last_bits := boss.last_rank.bits_host()),
        last_len=np.array(_last_bits.shape[0]),
        F=np.asarray(boss.F),
        valid=np.packbits(graph.valid_rank.bits_host()),
    )
    if state != "small" and boss.edge_lanes is not None:
        d["edge_lanes"] = np.asarray(boss.edge_lanes)
    if boss.weights is not None:
        d["weights"] = np.asarray(boss.weights)
    np.savez_compressed(path, **d)
    return path


def load_graph(path: str) -> DbgSuccinct:
    if not path.endswith(GRAPH_EXT):
        path = path + GRAPH_EXT
    with np.load(path) as d:
        alphabet = ALPHABETS[str(d["alphabet"])]
        mode = str(d["mode"])
        n = int(d["last_len"])
        last = np.unpackbits(d["last"])[:n].astype(bool)
        weights = jnp.asarray(d["weights"]) if "weights" in d else None
        lanes = jnp.asarray(d["edge_lanes"]) if "edge_lanes" in d else None
        boss = Boss.from_arrays(
            k=int(d["k"]), alph_size=alphabet.size,
            bits_per_char=alphabet.bits_per_char,
            W=jnp.asarray(d["W"].astype(np.int32)),
            last=jnp.asarray(last),
            F=jnp.asarray(d["F"]),
            edge_lanes=lanes,
            weights=weights)
        valid = None
        if "valid" in d:
            valid = jnp.asarray(np.unpackbits(d["valid"])[:n].astype(bool))
    return DbgSuccinct.from_boss(boss, alphabet, mode, valid=valid)


def index_bytes(graph: DbgSuccinct) -> int:
    """Total bytes of the loaded index arrays (for stats bytes/edge)."""
    total = 0
    for arr in jax.tree_util.tree_leaves((graph.boss, graph.valid_rank)):
        try:
            total += arr.size * arr.dtype.itemsize
        except AttributeError:
            pass
    return total
