"""Blocked rank/select property tests (vs numpy gold) and small-state
graph parity (rank/select-only search path, boss.hpp:640-750 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import REFERENCE_DATA
from metagraph_tpu.common.ranksel import BitRank, SymbolRank


@pytest.mark.parametrize("n", [1, 31, 32, 33, 100, 4097])
def test_bitrank_properties(n, rng):
    bits = rng.random(n) < 0.3
    br = BitRank.build(jnp.asarray(bits))
    pref = np.concatenate([[0], np.cumsum(bits)])
    i = rng.integers(-1, n, 200)
    np.testing.assert_array_equal(
        np.asarray(br.rank1(jnp.asarray(i))), pref[np.clip(i, -1, n - 1) + 1])
    ii = np.clip(i, 0, n - 1)
    np.testing.assert_array_equal(
        np.asarray(br.bit(jnp.asarray(ii))), bits[ii])
    total = int(bits.sum())
    if total:
        r = rng.integers(1, total + 1, 100)
        np.testing.assert_array_equal(
            np.asarray(br.select1(jnp.asarray(r))), np.nonzero(bits)[0][r - 1])
    np.testing.assert_array_equal(br.set_positions(), np.nonzero(bits)[0])


@pytest.mark.parametrize("n", [1, 127, 128, 129, 3000])
def test_symbolrank_properties(n, rng):
    sigma = 10
    seq = rng.integers(0, sigma, n)
    sr = SymbolRank.build(jnp.asarray(seq), sigma)
    c = rng.integers(0, sigma, 200)
    i = rng.integers(-1, n, 200)
    gold = np.array([int((seq[:ii + 1] == cc).sum()) if ii >= 0 else 0
                     for cc, ii in zip(c, i)])
    np.testing.assert_array_equal(
        np.asarray(sr.rank(jnp.asarray(c), jnp.asarray(i))), gold)
    for cc in range(sigma):
        occ = np.nonzero(seq == cc)[0]
        if len(occ):
            r = rng.integers(1, len(occ) + 1, 30)
            got = np.asarray(sr.select(jnp.asarray(np.full(30, cc)),
                                       jnp.asarray(r)))
            np.testing.assert_array_equal(got, occ[r - 1])


def test_small_state_query_parity(tmp_path, rng):
    """A small-state graph (no edge_lanes) answers map_to_nodes through
    the rank/select tightening search identically to the fast state."""
    from metagraph_tpu.graph.boss_construct import build_boss
    from metagraph_tpu.graph.dbg_succinct import DbgSuccinct
    from metagraph_tpu.graph import io as graph_io
    from conftest import random_dna

    seqs = [random_dna(rng, 300) for _ in range(3)]
    boss = build_boss(seqs, 13)
    g = DbgSuccinct.from_boss(boss)
    p_fast = str(tmp_path / "fast")
    p_small = str(tmp_path / "small")
    graph_io.save_graph(p_fast, g, state="fast")
    graph_io.save_graph(p_small, g, state="small")
    gf = graph_io.load_graph(p_fast)
    gs = graph_io.load_graph(p_small)
    assert gs.boss.edge_lanes is None
    assert gs.num_nodes() == gf.num_nodes()
    # small file strictly smaller on disk
    import os
    assert os.path.getsize(p_small + ".dbg.npz") \
        < os.path.getsize(p_fast + ".dbg.npz")
    for s in [seqs[0], seqs[1][50:200], random_dna(rng, 80)]:
        np.testing.assert_array_equal(gs.map_to_nodes(s),
                                      gf.map_to_nodes(s))


def test_ranksel_search_vs_lanes(rng):
    """index_edge_ranksel agrees with the lane binary search for every
    edge k-mer present in the graph and for absent probes."""
    from metagraph_tpu.graph.boss_construct import build_boss
    from metagraph_tpu.kmer import packing
    from conftest import random_dna

    seqs = [random_dna(rng, 200)]
    boss = build_boss(seqs, 9)
    K, B = boss.K, boss.bits_per_char
    lanes = boss.edge_lanes
    chars = np.asarray(packing.unpack_to_chars(lanes, K, B)).astype(np.int32)
    real = (chars > 0).all(axis=1)
    via_lanes = np.asarray(boss.map_to_edges(lanes))
    via_rank = np.asarray(boss.index_edge_ranksel(jnp.asarray(chars)))
    np.testing.assert_array_equal(via_rank[real], via_lanes[real])
    # absent probes
    probe = rng.integers(1, 5, (50, K)).astype(np.int32)
    pl = packing.pack_from_chars(jnp.asarray(probe.astype(np.uint8)), K, B)
    np.testing.assert_array_equal(
        np.asarray(boss.index_edge_ranksel(jnp.asarray(probe))),
        np.asarray(boss.map_to_edges(pl)))


def test_small_state_traversal_parity(tmp_path, rng):
    """Small-state graphs traverse (successors/predecessors/unitigs)
    identically to fast state via the rank/select bwd-walk decode — the
    reference supports traversal in every representation state."""
    from conftest import random_dna
    from metagraph_tpu.graph.boss_construct import build_boss
    from metagraph_tpu.graph.dbg_succinct import DbgSuccinct
    from metagraph_tpu.graph import io as graph_io
    from metagraph_tpu.graph.traversal import unitig_sequences

    seqs = [random_dna(rng, 250) for _ in range(3)]
    g = DbgSuccinct.from_boss(build_boss(seqs, 11))
    p = str(tmp_path / "sm")
    graph_io.save_graph(p, g, state="small")
    gs = graph_io.load_graph(p)
    assert gs.boss.edge_lanes is None
    nodes = jnp.arange(1, g.num_nodes() + 1, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(gs.successors(nodes)),
                                  np.asarray(g.successors(nodes)))
    np.testing.assert_array_equal(np.asarray(gs.predecessors(nodes)),
                                  np.asarray(g.predecessors(nodes)))
    np.testing.assert_array_equal(
        gs.node_kmers_chars(np.arange(1, g.num_nodes() + 1)),
        g.node_kmers_chars(np.arange(1, g.num_nodes() + 1)))
    assert sorted(unitig_sequences(gs)) == sorted(unitig_sequences(g))


def test_index_range_nodes(rng):
    """index_range_nodes returns the full [lo, hi) edge range of a node
    (the +1 increment lands above the label field)."""
    from conftest import random_dna
    from metagraph_tpu.graph.boss_construct import build_boss
    from metagraph_tpu.kmer import packing
    from metagraph_tpu.common import packed as pk

    seqs = [random_dna(rng, 150) for _ in range(2)]
    boss = build_boss(seqs, 5)     # small k: real branching
    K, B = boss.K, boss.bits_per_char
    lanes = boss.edge_lanes
    chars = np.asarray(packing.unpack_to_chars(lanes, K, B))
    real = (chars > 0).all(axis=1)
    # group rows by node (all chars except the label field)
    node_chars = chars[:, :K - 1]
    want = {}
    for i in np.nonzero(real)[0]:
        want.setdefault(node_chars[i].tobytes(), []).append(i)
    multi = [v for v in want.values() if len(v) >= 2]
    assert multi, "need at least one branching node for this test"
    rows = np.array([v[0] for v in want.values()])
    q = np.asarray(lanes[:, rows])
    # zero the label field -> the node-prefix query
    q_lanes = pk.set_field(jnp.asarray(q), 0,
                           jnp.zeros((len(rows),), jnp.uint32), B)
    lo, hi = boss.index_range_nodes(q_lanes)
    got = np.asarray(hi) - np.asarray(lo)
    want_sizes = np.array([len(v) for v in want.values()])
    np.testing.assert_array_equal(got, want_sizes)
