"""Pallas merge-path kernel: interpret-mode parity with the sort fallback.

The kernel itself runs on TPU in production (common/merge.py); these
tests run its exact logic through the Pallas interpreter on CPU and
check output equivalence with the lax.sort-based fallback semantics
(sorted output, PADs at the tail, payloads paired with their keys).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from metagraph_tpu.common import merge, packed


def _mk(rng, n_valid, cap, L=2, hi=1 << 63):
    if L == 1:
        hi = min(hi, 1 << 31)          # keep single-lane keys sorted + < PAD
    v = rng.integers(0, hi, n_valid).astype(np.uint64)
    # sort by the LANE TUPLE order (what merge_sorted requires), not by v
    v = ((v >> 33) << 32) | (v & 0xFFFFFFFF)
    v.sort()
    lanes = np.full((L, cap), 0xFFFFFFFF, np.uint32)
    if n_valid:
        lanes[L - 1, :n_valid] = (v & 0xFFFFFFFF).astype(np.uint32)
        if L > 1:
            lanes[L - 2, :n_valid] = (v >> 32).astype(np.uint32)
        for j in range(max(L - 2, 0)):
            lanes[j, :n_valid] = 0
    return jnp.asarray(lanes)


CASES = [
    (100, 200, 8192, 8192, 2),
    (8192, 8192, 8192, 8192, 2),
    (5000, 9000, 8192, 16384, 3),
    (0, 50, 8192, 8192, 2),
    (300, 0, 1024, 512, 1),
    (7000, 7000, 8192, 8192, 2),
]


@pytest.mark.parametrize("na,nb,ca,cb,L", CASES)
def test_merge_matches_fallback(na, nb, ca, cb, L):
    rng = np.random.default_rng(na * 31 + nb)
    a, b = _mk(rng, na, ca, L), _mk(rng, nb, cb, L)
    pa = jnp.asarray(rng.integers(0, 1 << 30, ca).astype(np.int32))
    pb = jnp.asarray(rng.integers(0, 1 << 30, cb).astype(np.int32))
    got, (gp,) = merge.merge_sorted(a, b, (pa,), (pb,),
                                    interpret=True, force_pallas=True)
    want, (wp,) = merge._merge_fallback(a, b, (pa,), (pb,))
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # payloads: valid slots only, order-insensitive within equal keys
    nv = na + nb
    gk, wk = np.asarray(got), np.asarray(want)
    gpn, wpn = np.asarray(gp), np.asarray(wp)
    gz = np.lexsort([gpn[:nv]] + [gk[j][:nv] for j in range(L)])
    wz = np.lexsort([wpn[:nv]] + [wk[j][:nv] for j in range(L)])
    np.testing.assert_array_equal(gpn[:nv][gz], wpn[:nv][wz])


def test_merge_duplicate_heavy():
    """Massively duplicated keys exercise split-point tie handling."""
    rng = np.random.default_rng(7)
    na = nb = 4096
    va = np.sort(rng.integers(0, 37, na).astype(np.uint64))
    vb = np.sort(rng.integers(0, 37, nb).astype(np.uint64))
    a = np.full((2, 8192), 0xFFFFFFFF, np.uint32)
    b = np.full((2, 8192), 0xFFFFFFFF, np.uint32)
    a[1, :na] = va
    a[0, :na] = 0
    b[1, :nb] = vb
    b[0, :nb] = 0
    got, _ = merge.merge_sorted(jnp.asarray(a), jnp.asarray(b),
                                interpret=True, force_pallas=True)
    want, _ = merge._merge_fallback(jnp.asarray(a), jnp.asarray(b), (), ())
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_merge_fallback_dispatch_on_cpu():
    """Without force_pallas, non-TPU backends take the fallback path."""
    rng = np.random.default_rng(3)
    a, b = _mk(rng, 50, 1024, 2), _mk(rng, 60, 1024, 2)
    got, _ = merge.merge_sorted(a, b)
    want, _ = merge._merge_fallback(a, b, (), ())
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_merge_path_splits_monotone():
    rng = np.random.default_rng(11)
    a, b = _mk(rng, 6000, 8192, 2), _mk(rng, 5000, 8192, 2)
    ai = np.asarray(merge.merge_path_splits(a, b, 1024))
    assert ai[0] == 0 and ai[-1] == 8192
    assert np.all(np.diff(ai) >= 0)
    assert np.all(np.diff(ai) <= 1024)


# ---------------------------------------------------------------------------
# partition_compact: interpret-mode parity with packed.compact
# ---------------------------------------------------------------------------

PART_CASES = [
    # (n, capacity, keep_frac, L)  — chunk is 1024 in all cases
    (1024, 1024, 0.5, 2),      # chunk-multiple n, capacity == n
    (4096, 4096, 0.3, 2),      # multi-chunk
    (3000, 3000, 0.5, 2),      # non-multiple n (pad path)
    (2048, 512, 0.7, 2),       # capacity < n (truncation + true count)
    (1500, 8192, 0.4, 3),      # capacity > n (tail fill), 3 lanes
    (2048, 2048, 1.0, 2),      # all-keep
    (2048, 2048, 0.0, 2),      # none-keep
    (1024, 1024, 0.01, 1),     # sparse keep, single lane
]


@pytest.mark.parametrize("n,capacity,frac,L", PART_CASES)
def test_partition_compact_matches_packed_compact(n, capacity, frac, L):
    rng = np.random.default_rng(n * 7 + capacity + L)
    lanes = jnp.asarray(
        rng.integers(0, 1 << 31, (L, n)).astype(np.uint32))
    keep = jnp.asarray(rng.random(n) < frac)
    p_i32 = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    p_u32 = jnp.asarray(rng.integers(0, 1 << 32, n).astype(np.uint32))
    got, gcount, (gi, gu) = merge.partition_compact(
        lanes, keep, capacity, p_i32, p_u32,
        chunk=1024, interpret=True, force_pallas=True)
    want, wcount, (wi, wu) = packed.compact(
        lanes, keep, capacity, p_i32, p_u32)
    assert int(gcount) == int(wcount)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    np.testing.assert_array_equal(np.asarray(gu), np.asarray(wu))


def test_partition_compact_extra_fill():
    rng = np.random.default_rng(5)
    n = 1024
    lanes = jnp.asarray(rng.integers(0, 1 << 31, (2, n)).astype(np.uint32))
    keep = jnp.asarray(rng.random(n) < 0.25)
    pay = jnp.asarray(rng.integers(0, 100, n).astype(np.int32))
    got, gcount, (gp,) = merge.partition_compact(
        lanes, keep, 2048, pay, extra_fill=-7,
        chunk=1024, interpret=True, force_pallas=True)
    want, wcount, (wp,) = packed.compact(lanes, keep, 2048, pay,
                                         extra_fill=-7)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))


def test_partition_compact_stability():
    """Kept entries must preserve original relative order (stable)."""
    n = 2048
    rng = np.random.default_rng(13)
    # many duplicate keys; payload = original index proves stability
    lanes = jnp.asarray(
        rng.integers(0, 17, (2, n)).astype(np.uint32))
    keep = jnp.asarray(rng.random(n) < 0.6)
    idx = jnp.arange(n, dtype=jnp.int32)
    got, gcount, (gidx,) = merge.partition_compact(
        lanes, keep, n, idx, chunk=1024, interpret=True, force_pallas=True)
    kept_idx = np.asarray(gidx)[:int(gcount)]
    np.testing.assert_array_equal(kept_idx, np.sort(kept_idx))
    np.testing.assert_array_equal(kept_idx, np.where(np.asarray(keep))[0])


def test_merge_zero_width_sides():
    """na==0 / nb==0 operands early-return instead of crashing the
    merge-path gather (advisor round-3 finding)."""
    rng = np.random.default_rng(2)
    a = _mk(rng, 100, 1024, 2)
    empty = jnp.full((2, 0), 0xFFFFFFFF, jnp.uint32)
    got, _ = merge.merge_sorted(a, empty, interpret=True, force_pallas=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(a))
    got2, _ = merge.merge_sorted(empty, a, interpret=True, force_pallas=True)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(a))


def test_non_power_of_two_chunk_rejected():
    rng = np.random.default_rng(4)
    a, b = _mk(rng, 10, 384, 2), _mk(rng, 10, 384, 2)
    with pytest.raises(AssertionError):
        merge.merge_sorted(a, b, chunk=384, interpret=True,
                           force_pallas=True)
    with pytest.raises(AssertionError):
        merge.partition_compact(a, jnp.ones((384,), bool), 384,
                                chunk=384, interpret=True,
                                force_pallas=True)


# ---------------------------------------------------------------------------
# sort_packed: interpret-mode parity with packed.sort
# ---------------------------------------------------------------------------

SORT_CASES = [
    # (n_valid, cap, L, leaf)  — chunk 1024
    (4000, 4096, 2, 1024),       # 4 leaf runs, 2 levels
    (8192, 8192, 2, 1024),       # 8 runs, 3 levels, chunk-exact
    (5000, 6144, 3, 2048),       # ragged: 3 runs (lone trailing run)
    (900, 1024, 2, 1024),        # single leaf (pure lax.sort path)
    (10000, 10240, 1, 1024),     # 10 runs, ragged pairing, single lane
]


@pytest.mark.parametrize("n,cap,L,leaf", SORT_CASES)
def test_sort_packed_matches_lax_sort(n, cap, L, leaf):
    rng = np.random.default_rng(n + cap + L)
    lanes = np.full((L, cap), 0xFFFFFFFF, np.uint32)
    # duplicates likely: small value range
    for j in range(L):
        lanes[j, :n] = rng.integers(0, 50, n).astype(np.uint32)
    lanes = jnp.asarray(lanes)
    pay = jnp.asarray(rng.integers(0, 1 << 30, cap).astype(np.int32))
    got, (gp,) = merge.sort_packed(lanes, pay, chunk=1024, leaf=leaf,
                                   interpret=True, force_pallas=True)
    want, (wp,) = packed.sort(lanes, pay)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # payload multiset per equal-key group must match over VALID entries
    # (payloads of PAD-keyed slots are unspecified, like merge_sorted)
    gk, wk = np.asarray(got), np.asarray(want)
    gpn, wpn = np.asarray(gp)[:n], np.asarray(wp)[:n]
    gz = np.lexsort([gpn] + [gk[j][:n] for j in range(L)])
    wz = np.lexsort([wpn] + [wk[j][:n] for j in range(L)])
    np.testing.assert_array_equal(gpn[gz], wpn[wz])


def test_sort_packed_random_large():
    """Bigger multi-level case with mostly-unique keys."""
    rng = np.random.default_rng(77)
    n = 50000
    cap = 51200   # 50 leaf runs of 1024 -> 6 ragged levels
    v = rng.integers(0, 1 << 62, n).astype(np.uint64)
    lanes = np.full((2, cap), 0xFFFFFFFF, np.uint32)
    lanes[0, :n] = (v >> 32).astype(np.uint32)
    lanes[1, :n] = (v & 0xFFFFFFFF).astype(np.uint32)
    got, _ = merge.sort_packed(jnp.asarray(lanes), chunk=1024, leaf=1024,
                               interpret=True, force_pallas=True)
    want, _ = packed.sort(jnp.asarray(lanes))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
