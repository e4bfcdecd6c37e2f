"""Tests for BOSS k-mer packing semantics vs a char-level spec."""

import numpy as np
import jax.numpy as jnp
import pytest

from metagraph_tpu.common import packed
from metagraph_tpu.kmer import packing
from metagraph_tpu.kmer.alphabets import DNA
from metagraph_tpu.kmer.extractor import encode_sequences, extract_packed_kmers

B = DNA.bits_per_char


def rand_kmers(rng, n, K, lo=1, hi=5):
    return rng.integers(lo, hi, size=(n, K), dtype=np.int64).astype(np.uint8)


@pytest.mark.parametrize("K", [3, 8, 11, 21, 31])
def test_pack_unpack_roundtrip(rng, K):
    chars = rand_kmers(rng, 50, K)
    lanes = packing.pack_from_chars(jnp.asarray(chars), K, B)
    assert lanes.shape[0] == packing.lanes_for(K, B)
    back = np.asarray(packing.unpack_to_chars(lanes, K, B))
    np.testing.assert_array_equal(back, chars)
    np.testing.assert_array_equal(np.asarray(packing.label(lanes, B)), chars[:, K - 1])
    np.testing.assert_array_equal(np.asarray(packing.first_char(lanes, B)), chars[:, 0])
    np.testing.assert_array_equal(np.asarray(packing.top_char(lanes, K, B)),
                                  chars[:, K - 2])


@pytest.mark.parametrize("K", [3, 11, 21])
def test_boss_sort_order(rng, K):
    """Integer order == (colex source node, edge label)."""
    chars = rand_kmers(rng, 200, K)
    lanes = packing.pack_from_chars(jnp.asarray(chars), K, B)
    s, (perm,) = packed.sort(lanes, jnp.arange(200))
    perm = np.asarray(perm)
    keys = [tuple(chars[i, K - 2::-1]) + (chars[i, K - 1],) for i in range(200)]
    expect = sorted(range(200), key=lambda i: keys[i])
    assert [keys[i] for i in perm] == [keys[i] for i in expect]


@pytest.mark.parametrize("K", [3, 11, 21, 31])
def test_to_next_to_prev(rng, K):
    chars = rand_kmers(rng, 50, K)
    lanes = packing.pack_from_chars(jnp.asarray(chars), K, B)
    nxt = np.asarray(packing.unpack_to_chars(packing.to_next(lanes, K, B, 0), K, B))
    want = np.concatenate([chars[:, 1:], np.zeros((50, 1), np.uint8)], axis=1)
    np.testing.assert_array_equal(nxt, want)
    # with explicit new labels
    labs = rand_kmers(rng, 50, 1)[:, 0]
    nxt2 = np.asarray(packing.unpack_to_chars(
        packing.to_next(lanes, K, B, jnp.asarray(labs)), K, B))
    want2 = np.concatenate([chars[:, 1:], labs[:, None]], axis=1)
    np.testing.assert_array_equal(nxt2, want2)
    prv = np.asarray(packing.unpack_to_chars(packing.to_prev(lanes, K, B, 0), K, B))
    wantp = np.concatenate([np.zeros((50, 1), np.uint8), chars[:, :K - 1]], axis=1)
    np.testing.assert_array_equal(prv, wantp)


@pytest.mark.parametrize("K", [3, 12, 21])
def test_node_and_target_keys(rng, K):
    chars = rand_kmers(rng, 100, K)
    lanes = packing.pack_from_chars(jnp.asarray(chars), K, B)
    # node key equality <-> same source node e_1..e_{K-1}
    nk = np.asarray(packing.node_key(lanes, B))
    for i in range(0, 20, 2):
        same = np.array_equal(chars[i, :K - 1], chars[i + 1, :K - 1])
        assert (np.array_equal(nk[:, i], nk[:, i + 1])) == same
    # target key equality <-> same (e_2..e_{K-1}, e_K)
    tk = np.asarray(packing.target_key(lanes, B))
    chars2 = chars.copy()
    chars2[:, 0] = (chars2[:, 0] % 4) + 1  # change first char only
    lanes2 = packing.pack_from_chars(jnp.asarray(chars2), K, B)
    tk2 = np.asarray(packing.target_key(lanes2, B))
    np.testing.assert_array_equal(tk, tk2)


@pytest.mark.parametrize("K", [3, 11, 21, 31])
def test_reverse_complement(rng, K):
    chars = rand_kmers(rng, 50, K)
    lanes = packing.pack_from_chars(jnp.asarray(chars), K, B)
    rc = np.asarray(packing.unpack_to_chars(
        packing.reverse_complement(lanes, K, B, DNA.complement), K, B))
    comp = np.array(DNA.complement, np.uint8)
    want = comp[chars[:, ::-1]]
    np.testing.assert_array_equal(rc, want)
    # involution
    rc2 = np.asarray(packing.unpack_to_chars(packing.reverse_complement(
        packing.reverse_complement(lanes, K, B, DNA.complement), K, B,
        DNA.complement), K, B))
    np.testing.assert_array_equal(rc2, chars)


def test_extractor_windows(rng):
    K = 5
    seqs = [b"ACGTACGT", b"ACGNTACGTT", b"ACG", b"TTTTT"]
    codes = encode_sequences(seqs, DNA)
    lanes, count = extract_packed_kmers(jnp.asarray(codes), K, B)
    n = int(count)
    got = {tuple(r) for r in
           np.asarray(packing.unpack_to_chars(lanes[:, :n], K, B))}
    tbl = DNA.encode_table()
    want = set()
    for s in seqs:
        cs = tbl[np.frombuffer(s, np.uint8)]
        for i in range(len(cs) - K + 1):
            w = cs[i:i + K]
            if (w != 255).all():
                want.add(tuple(w))
    # extraction keeps duplicates; compare sets and total count
    total = sum(max(0, len(s) - K + 1) - sum(
        1 for i in range(len(s) - K + 1) if b"N" in s[i:i + K]) for s in seqs
        if len(s) >= K)
    assert n == total
    assert got == want


def test_extractor_suffix_filter(rng):
    K = 6
    seqs = [bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=500))]
    codes = encode_sequences(seqs, DNA)
    suffix = (2, 3)  # node suffix "CG"
    lanes, count = extract_packed_kmers(jnp.asarray(codes), K, B, suffix=suffix)
    n = int(count)
    got = np.asarray(packing.unpack_to_chars(lanes[:, :n], K, B))
    assert n > 0
    np.testing.assert_array_equal(got[:, K - 3], 2)
    np.testing.assert_array_equal(got[:, K - 2], 3)


def test_dna_case_sensitive_alphabet():
    """DNACaseSent keeps upper/lower case distinct (reference
    alphabets.hpp:46-59) while plain DNA folds case."""
    from metagraph_tpu.kmer.alphabets import DNA_CASE_SENT, DNA
    tbl = DNA_CASE_SENT.encode_table()
    assert tbl[ord("A")] == 1 and tbl[ord("a")] == 6
    assert tbl[ord("T")] == 4 and tbl[ord("t")] == 9
    assert tbl[ord("N")] == 5 and tbl[ord("n")] == 255  # lower n unmapped
    # complement: A<->t, C<->g, G<->c, T<->a, N self
    comp = DNA_CASE_SENT.complement
    assert comp[1] == 9 and comp[9] == 1
    assert comp[2] == 8 and comp[8] == 2
    assert comp[5] == 5
    # plain DNA folds case: 'a' == 'A'
    dt = DNA.encode_table()
    assert dt[ord("a")] == dt[ord("A")] == 1


def test_dna_case_sensitive_build():
    """Mixed-case input yields case-distinct k-mers under DNACaseSent
    but identical k-mers under DNA."""
    from metagraph_tpu.kmer.alphabets import DNA_CASE_SENT, DNA
    from metagraph_tpu.graph.boss_construct import build_boss
    seqs = [b"ACGTACGTACGT", b"acgtacgtacgt"]
    b_cs = build_boss(seqs, 5, alphabet=DNA_CASE_SENT)
    b_fold = build_boss(seqs, 5, alphabet=DNA)
    # case-sensitive: the two strings share no k-mers -> ~2x the edges
    assert b_cs.num_edges > b_fold.num_edges * 3 // 2
