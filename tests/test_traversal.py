"""Unitig/contig extraction tests vs a brute-force gold implementation."""

import numpy as np
import pytest

from conftest import random_dna
from metagraph_tpu.graph.boss_construct import build_boss
from metagraph_tpu.graph.dbg_succinct import DbgSuccinct
from metagraph_tpu.graph.traversal import (contig_sequences,
                                           unitig_decomposition,
                                           unitig_sequences)
from metagraph_tpu.kmer.alphabets import DNA


def build_graph(seqs, k):
    return DbgSuccinct.from_boss(build_boss(seqs, k), DNA, "basic")


def gold_unitigs(seqs, k):
    """Brute-force unitig set over the distinct-k-mer DBG."""
    kmers = set()
    for s in seqs:
        for i in range(len(s) - k + 1):
            w = s[i:i + k]
            if all(c in b"ACGT" for c in w):
                kmers.add(bytes(w))
    succ = {km: [km[1:] + bytes([c]) for c in b"ACGT"
                 if km[1:] + bytes([c]) in kmers] for km in kmers}
    pred = {km: [bytes([c]) + km[:-1] for c in b"ACGT"
                 if bytes([c]) + km[:-1] in kmers] for km in kmers}

    def is_chain_link(a, b):
        return len(succ[a]) == 1 and len(pred[b]) == 1

    nxt = {}
    for km in kmers:
        if len(succ[km]) == 1 and len(pred[succ[km][0]]) == 1 \
                and succ[km][0] != km or \
           (len(succ[km]) == 1 and len(pred[succ[km][0]]) == 1
                and succ[km][0] == km):
            nxt[km] = succ[km][0]
    prv = {v: u for u, v in nxt.items()}
    out = set()
    visited = set()
    for km in kmers:
        if km in visited:
            continue
        # walk back to start
        cur = km
        seen = {cur}
        while cur in prv and prv[cur] not in seen:
            cur = prv[cur]
            seen.add(cur)
        if cur in prv:  # cycle: normalize by rotation
            cyc = [cur]
            nx = nxt[cur]
            while nx != cur:
                cyc.append(nx)
                nx = nxt[nx]
            visited |= set(cyc)
            s = cyc[0] + bytes(x[-1] for x in cyc[1:])
            rots = {tuple(cyc[i:] + cyc[:i]) for i in range(len(cyc))}
            out.add(("cycle", frozenset(cyc)))
        else:
            chain = [cur]
            while cur in nxt:
                cur = nxt[cur]
                chain.append(cur)
            visited |= set(chain)
            out.add(("chain", chain[0] + bytes(x[-1] for x in chain[1:])))
    return out


def norm_unitigs(seqs_out, k, gold):
    """Compare produced unitigs with gold, cycles up to rotation."""
    gold_chains = {g[1] for g in gold if g[0] == "chain"}
    gold_cycles = [g[1] for g in gold if g[0] == "cycle"]
    got_chains = set()
    got_cycle_kmersets = []
    for s in seqs_out:
        kms = frozenset(s[i:i + k] for i in range(len(s) - k + 1))
        # try matching as chain first
        if s in gold_chains:
            got_chains.add(s)
        else:
            got_cycle_kmersets.append(kms)
    assert got_chains == gold_chains, (got_chains, gold_chains)
    assert sorted(map(sorted, got_cycle_kmersets)) == \
        sorted(sorted(g) for g in gold_cycles)


def test_single_sequence_one_unitig(rng):
    k = 11
    s = random_dna(rng, 300)
    g = build_graph([s], k)
    if g.num_nodes() == len(s) - k + 1:  # no repeats
        seqs = unitig_sequences(g)
        norm_unitigs(seqs, k, gold_unitigs([s], k))


@pytest.mark.parametrize("k,n,m", [(5, 100, 4), (7, 300, 3), (4, 60, 6)])
def test_unitigs_random(rng, k, n, m):
    seqs = [random_dna(rng, n) for _ in range(m)]
    g = build_graph(seqs, k)
    got = unitig_sequences(g)
    norm_unitigs(got, k, gold_unitigs(seqs, k))


def test_unitigs_cycle(rng):
    k = 4
    core = b"ACGTTGCA"
    s = core + core  # wraps: contains the cycle of all 4-mers of the repeat
    g = build_graph([s], k)
    got = unitig_sequences(g)
    norm_unitigs(got, k, gold_unitigs([s], k))


def test_contigs_cover_all_nodes(rng):
    k = 6
    seqs = [random_dna(rng, 200) for _ in range(3)]
    g = build_graph(seqs, k)
    contigs = contig_sequences(g)
    seen = []
    for c in contigs:
        for i in range(len(c) - k + 1):
            seen.append(c[i:i + k])
    # every node exactly once
    assert len(seen) == g.num_nodes()
    assert len(set(seen)) == g.num_nodes()
    # all contig k-mers are graph nodes
    for c in contigs:
        nodes = g.map_to_nodes(c)
        assert (nodes > 0).all()


def test_pick_kmer_threshold_histogram():
    """Gamma-Poisson threshold on a synthetic error+signal histogram
    (errors ~ low coverage, signal ~ cov 30)."""
    from metagraph_tpu.graph.cleaning import pick_kmer_threshold
    hist = np.zeros(64, np.float64)
    hist[1] = 100000
    hist[2] = 20000
    hist[3] = 5000
    hist[4] = 1000
    for c in range(20, 45):
        hist[c] = 5000 * np.exp(-((c - 30) ** 2) / 30)
    cut = pick_kmer_threshold(hist.astype(np.uint64))
    # errors vanish by coverage ~20 (the valley has zero observed counts,
    # so the FDR ratio first becomes finite-and-small at the signal mode)
    assert 3 <= cut <= 21
    # degenerate histogram -> estimation fails like the reference (-1)
    flat = np.zeros(10, np.uint64)
    flat[1] = 5
    assert pick_kmer_threshold(flat) in (-1, 1, 2)
