"""BOSS construction tests: structural invariants + reference oracle counts.

Oracle values come from the reference's own integration tests
(metagraph/integration_tests/test_build.py:60-130), which assert node
counts from `metagraph stats` on tests/data/transcripts_1000.fa.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import REFERENCE_DATA, random_dna
from metagraph_tpu.common import packed
from metagraph_tpu.graph.boss import Boss
from metagraph_tpu.graph.boss_construct import build_boss
from metagraph_tpu.kmer import packing
from metagraph_tpu.kmer.alphabets import DNA
from metagraph_tpu.seqio.fasta import read_sequences

B = DNA.bits_per_char


def boss_rows(boss: Boss):
    """Unpacked (N, K) char codes of all edge rows 1..num_edges."""
    return np.asarray(packing.unpack_to_chars(
        boss.edge_lanes, boss.K, B))


def gold_kmer_set(seqs, K, canonical=False):
    tbl = DNA.encode_table()
    kmers = set()
    for s in seqs:
        cs = tbl[np.frombuffer(s, np.uint8)]
        for i in range(len(cs) - K + 1):
            w = cs[i:i + K]
            if (w != 255).all() and (w != 0).all():
                kmers.add(tuple(int(x) for x in w))
    if canonical:
        comp = DNA.complement
        kmers |= {tuple(comp[c] for c in km[::-1]) for km in kmers}
    return kmers


def check_invariants(boss: Boss, real_set):
    rows = boss_rows(boss)
    N, K = rows.shape
    alph = boss.alph_size
    # 1. rows strictly sorted in BOSS order
    keys = [tuple(rows[i, K - 2::-1]) + (rows[i, K - 1],) for i in range(N)]
    assert keys == sorted(keys)
    assert len(set(keys)) == N
    # 2. the real (sentinel-free) rows equal the expected k-mer set
    real_rows = {tuple(int(x) for x in r) for r in rows if (r != 0).all()}
    assert real_rows == real_set
    # 3. last bits: set exactly on final edge of each source-node group
    W = np.asarray(boss.W)
    last = np.asarray(boss.last)
    nodes = [tuple(rows[i, :K - 1]) for i in range(N)]
    for i in range(N):
        is_last = (i == N - 1) or nodes[i + 1] != nodes[i]
        assert bool(last[i + 1]) == is_last, i
    assert not last[0] and W[0] == 0
    # 4. W values: label + minus flag on non-first incoming edge
    seen_targets = set()
    for i in range(N):
        lab = int(rows[i, K - 1])
        tkey = (tuple(rows[i, 1:K - 1]), lab)
        expect = lab
        if lab != 0:
            if tkey in seen_targets:
                expect = lab + alph
            seen_targets.add(tkey)
        assert int(W[i + 1]) == expect, (i, rows[i])
    # 5. F offsets count edges by source-node last char
    F = np.asarray(boss.F)
    topc = rows[:, K - 2].astype(int)
    for c in range(alph):
        assert F[c] == int((topc < c).sum()), c
    # 6. num_nodes == number of distinct source nodes
    assert int(boss.num_nodes()) == len(set(nodes))
    # 7. every node except the root $^{k} has exactly one unflagged
    #    incoming-edge representative per (target, label) pair — implied by 4.
    # 8. fwd: target row's node == (e_2..e_{K-1}, label)
    idx = np.arange(1, N + 1)
    labs = W[1:] % alph
    fwd = np.asarray(boss.fwd(jnp.asarray(idx), jnp.asarray(labs)))
    for i in range(N):
        if labs[i] == 0:
            continue
        tgt = fwd[i]
        assert 1 <= tgt <= N
        want_node = tuple(rows[i, 1:K - 1]) + (labs[i],)
        got_node = tuple(rows[tgt - 1, :K - 1])
        assert got_node == want_node, (i, rows[i], rows[tgt - 1])
        assert last[tgt]
    # 9. bwd: source of first incoming edge
    bwd = np.asarray(boss.bwd(jnp.asarray(idx)))
    for i in range(N):
        j = bwd[i]
        if tuple(rows[i, :K - 1]) == (0,) * (K - 1):
            continue  # root: reference returns 1
        assert 1 <= j <= N
        # edge j must point to node(i): suffix matches and label matches
        assert tuple(rows[j - 1, 1:K - 1]) + (int(rows[j - 1, K - 1]),) \
            == tuple(rows[i, :K - 1]), (i, j, rows[i], rows[j - 1])
        assert int(W[j]) < alph  # representative (unflagged) edge
    # 10. map_to_edges finds every row
    lanes = packing.pack_from_chars(jnp.asarray(rows), K, B)
    got = np.asarray(boss.map_to_edges(lanes))
    np.testing.assert_array_equal(got, idx)
    # and misses absent kmers
    fake = rows.copy()
    fake[:, 0] = 0 if (rows[:, 0] != 0).all() else fake[:, 0]


@pytest.mark.parametrize("k,n,nseq", [(4, 40, 3), (6, 200, 5), (11, 400, 2)])
def test_invariants_random(rng, k, n, nseq):
    seqs = [random_dna(rng, n) for _ in range(nseq)]
    boss = build_boss(seqs, k)
    check_invariants(boss, gold_kmer_set(seqs, k))


@pytest.mark.parametrize("k", [4, 8])
def test_invariants_canonical(rng, k):
    seqs = [random_dna(rng, 100) for _ in range(3)]
    boss = build_boss(seqs, k, mode="canonical")
    check_invariants(boss, gold_kmer_set(seqs, k, canonical=True))


def test_with_n_chars(rng):
    seqs = [b"ACGTNNACGTACGTNACGT", random_dna(rng, 50) + b"N" + random_dna(rng, 50)]
    boss = build_boss(seqs, 5)
    check_invariants(boss, gold_kmer_set(seqs, 5))


def test_tiny_k2_all_kmers(rng):
    # reference test_build_tiny_k: k=2 over many reads -> all 16 2-mers
    seqs = [random_dna(rng, 200) for _ in range(5)]
    boss = build_boss(seqs, 2)
    rows = boss_rows(boss)
    real = (rows != 0).all(axis=1).sum()
    assert real == 16


def test_weighted_counts(rng):
    seqs = [b"ACGTACGTACGT", b"ACGTACGT"]
    k = 4
    boss = build_boss(seqs, k, bits_per_count=8)
    rows = boss_rows(boss)
    weights = np.asarray(boss.weights)
    tbl = DNA.encode_table()
    from collections import Counter
    cnt = Counter()
    for s in seqs:
        cs = tbl[np.frombuffer(s, np.uint8)]
        for i in range(len(cs) - k + 1):
            cnt[tuple(int(x) for x in cs[i:i + k])] += 1
    for i in range(rows.shape[0]):
        key = tuple(int(x) for x in rows[i])
        if (rows[i] != 0).all():
            assert weights[i + 1] == min(cnt[key], 255), (i, key)
        else:
            assert weights[i + 1] == 0


@pytest.mark.slow
def test_transcripts_1000_oracle():
    """Reference integration oracle: 591997 unique 20-mers (basic),
    1159851 (canonical) — test_build.py:61,129."""
    seqs = read_sequences(REFERENCE_DATA + "/transcripts_1000.fa")
    boss = build_boss(seqs, 20)
    rows = boss_rows(boss)
    num_real = int((rows != 0).all(axis=1).sum())
    assert num_real == 591997
    # check dummy counts consistency
    nsrc, nsink = boss.num_dummy_edges()
    assert int(nsrc) + int(nsink) + num_real == boss.num_edges


@pytest.mark.slow
def test_transcripts_1000_canonical_oracle():
    seqs = read_sequences(REFERENCE_DATA + "/transcripts_1000.fa")
    boss = build_boss(seqs, 20, mode="canonical")
    rows = boss_rows(boss)
    assert int((rows != 0).all(axis=1).sum()) == 1159851


def test_large_finish_path_bit_identical(rng, monkeypatch):
    """The staged large-input finish produces exactly the same graph as
    the fused single-dispatch finish."""
    from conftest import random_dna
    from metagraph_tpu.graph import boss_construct as bc

    seqs = [random_dna(rng, 400) for _ in range(4)]
    fused = bc.build_boss(seqs, 13, mode="canonical", bits_per_count=8)
    monkeypatch.setattr(bc, "LARGE_FINISH_CAP", 1)   # force staged path
    staged = bc.build_boss(seqs, 13, mode="canonical", bits_per_count=8)
    assert staged.num_edges == fused.num_edges
    for f in ("W", "F", "weights", "edge_lanes", "lut"):
        np.testing.assert_array_equal(
            np.asarray(getattr(staged, f)), np.asarray(getattr(fused, f)),
            err_msg=f)
    np.testing.assert_array_equal(np.asarray(staged.last),
                                  np.asarray(fused.last))
    assert staged.lut_steps == fused.lut_steps
