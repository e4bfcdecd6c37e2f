"""Property tests for the multi-lane packed integer ops vs Python big ints."""

import numpy as np
import jax.numpy as jnp
import pytest

from metagraph_tpu.common import packed


def to_pyints(lanes):
    lanes = np.asarray(lanes)
    L, n = lanes.shape
    out = []
    for i in range(n):
        v = 0
        for j in range(L):
            v = (v << 32) | int(lanes[j, i])
        out.append(v)
    return out


def from_pyints(vals, L):
    out = np.zeros((L, len(vals)), np.uint32)
    for i, v in enumerate(vals):
        for j in range(L - 1, -1, -1):
            out[j, i] = v & 0xFFFFFFFF
            v >>= 32
    return out


@pytest.fixture(params=[1, 2, 3])
def L(request):
    return request.param


def rand_lanes(rng, L, n, top_clear=4):
    lanes = rng.integers(0, 2**32, size=(L, n), dtype=np.uint64).astype(np.uint32)
    lanes[0] >>= top_clear  # keep top bits clear so PAD stays maximal
    return lanes


def test_shift_roundtrip(rng, L):
    lanes = rand_lanes(rng, L, 64)
    total_bits = 32 * L
    for s in [0, 3, 4, 31, 32, 33, 45]:
        if s >= total_bits:
            continue
        got = np.asarray(packed.shift_right(jnp.asarray(lanes), s))
        want = from_pyints([v >> s for v in to_pyints(lanes)], L)
        np.testing.assert_array_equal(got, want)
        got = np.asarray(packed.shift_left(jnp.asarray(lanes), s))
        mask = (1 << total_bits) - 1
        want = from_pyints([(v << s) & mask for v in to_pyints(lanes)], L)
        np.testing.assert_array_equal(got, want)


def test_fields_roundtrip(rng, L):
    B = 4
    num_slots = (32 * L) // B
    fields = rng.integers(0, 16, size=(num_slots, 32), dtype=np.int64).astype(np.uint32)
    lanes = packed.from_fields(jnp.asarray(fields), B, lanes=L)
    back = packed.to_fields(lanes, num_slots, B)
    np.testing.assert_array_equal(np.asarray(back), fields)
    # set_field
    vals = rng.integers(0, 16, size=32, dtype=np.int64).astype(np.uint32)
    lanes2 = packed.set_field(lanes, 3, jnp.asarray(vals), B)
    np.testing.assert_array_equal(
        np.asarray(packed.get_field(lanes2, 3, B)), vals)
    np.testing.assert_array_equal(
        np.asarray(packed.get_field(lanes2, 2, B)), fields[2])


def test_compare_and_sort(rng, L):
    a = rand_lanes(rng, L, 100)
    b = rand_lanes(rng, L, 100)
    ia, ib = to_pyints(a), to_pyints(b)
    np.testing.assert_array_equal(
        np.asarray(packed.lt(jnp.asarray(a), jnp.asarray(b))),
        [x < y for x, y in zip(ia, ib)])
    np.testing.assert_array_equal(
        np.asarray(packed.eq(jnp.asarray(a), jnp.asarray(a))), True)
    s, (perm,) = packed.sort(jnp.asarray(a), jnp.arange(100))
    np.testing.assert_array_equal(to_pyints(np.asarray(s)), sorted(ia))
    np.testing.assert_array_equal(np.asarray(perm), np.argsort(ia, kind="stable"))


def test_searchsorted_and_isin(rng, L):
    keys = rand_lanes(rng, L, 50)
    ik = sorted(to_pyints(keys))
    keys_sorted = from_pyints(ik, L)
    q = rand_lanes(rng, L, 200)
    # make half of the queries exact hits
    hit_idx = rng.integers(0, 50, size=100)
    q[:, :100] = keys_sorted[:, hit_idx]
    iq = to_pyints(q)
    got = np.asarray(packed.searchsorted(jnp.asarray(keys_sorted), jnp.asarray(q)))
    want = np.searchsorted(ik, iq, side="left")
    np.testing.assert_array_equal(got, want)
    got_r = np.asarray(packed.searchsorted(jnp.asarray(keys_sorted), jnp.asarray(q),
                                           side="right"))
    np.testing.assert_array_equal(got_r, np.searchsorted(ik, iq, side="right"))
    got_in = np.asarray(packed.isin_sorted(jnp.asarray(keys_sorted), jnp.asarray(q)))
    np.testing.assert_array_equal(got_in, [v in set(ik) for v in iq])


def test_compact(rng):
    lanes = rand_lanes(rng, 2, 64)
    keep = rng.random(64) < 0.5
    extra = rng.integers(0, 100, size=64).astype(np.int32)
    out, cnt, (eo,) = packed.compact(jnp.asarray(lanes), jnp.asarray(keep), 64,
                                     jnp.asarray(extra))
    k = int(keep.sum())
    assert int(cnt) == k
    np.testing.assert_array_equal(np.asarray(out)[:, :k], lanes[:, keep])
    np.testing.assert_array_equal(np.asarray(out)[:, k:], packed.PAD_LANE)
    np.testing.assert_array_equal(np.asarray(eo)[:k], extra[keep])


def test_neighbor_ne():
    x = from_pyints([1, 1, 2, 5, 5, 5, 9], 2)
    got = np.asarray(packed.neighbor_ne(jnp.asarray(x)))
    np.testing.assert_array_equal(got, [1, 0, 1, 1, 0, 0, 1])
