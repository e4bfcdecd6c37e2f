"""Pallas alignment-scoring kernel vs the numpy gold DP (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from metagraph_tpu.align.pallas_dp import (batch_align_scores,
                                           batch_align_scores_reference)


def make_batch(rng, R, LQ, LR, mutate=True):
    qs = np.zeros((R, LQ), np.int32)
    rs = np.zeros((R, LR), np.int32)
    qlens = rng.integers(LQ // 2, LQ + 1, size=R)
    rlens = np.zeros(R, np.int64)
    for i in range(R):
        q = rng.integers(1, 5, size=qlens[i])
        r = list(q)
        if mutate:
            # substitutions
            for _ in range(rng.integers(0, 3)):
                p = rng.integers(0, len(r))
                r[p] = int(rng.integers(1, 5))
            # indel
            if rng.random() < 0.5 and len(r) > 4:
                p = rng.integers(1, len(r) - 1)
                if rng.random() < 0.5:
                    r.insert(p, int(rng.integers(1, 5)))
                else:
                    del r[p]
        r = r[:LR]
        qs[i, :qlens[i]] = q
        rs[i, :len(r)] = r
        rlens[i] = len(r)
    return qs, rs, qlens, rlens


@pytest.mark.parametrize("R,LQ,LR", [(4, 16, 20), (10, 32, 32), (3, 8, 24)])
def test_kernel_matches_gold(rng, R, LQ, LR):
    qs, rs, qlens, rlens = make_batch(rng, R, LQ, LR)
    got = np.asarray(batch_align_scores(
        jnp.asarray(qs), jnp.asarray(rs), jnp.asarray(qlens),
        jnp.asarray(rlens), interpret=True))
    want = batch_align_scores_reference(qs, rs, qlens, rlens)
    np.testing.assert_array_equal(got, want)


def test_exact_and_empty(rng):
    q = np.array([[1, 2, 3, 4, 1, 2, 3, 4]], np.int32)
    got = np.asarray(batch_align_scores(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray([8]),
        jnp.asarray([8]), interpret=True))
    assert got[0] == 16  # 8 matches * 2
    # empty ref -> best is the empty alignment (score 0 at origin)
    got = np.asarray(batch_align_scores(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray([8]),
        jnp.asarray([0]), interpret=True))
    assert got[0] == 0


def test_scoring_params(rng):
    # mid-sequence transition vs transversion (free ends can't clip it out
    # without losing more matches)
    q = np.array([[1, 1, 2, 3, 4, 4]], np.int32)   # AACGTT
    r_ts = np.array([[1, 1, 4, 3, 4, 4]], np.int32)  # C->T? codes 2->4 transition
    r_tv = np.array([[1, 1, 1, 3, 4, 4]], np.int32)  # C->A transversion
    n = jnp.asarray([6])
    s_ts = int(batch_align_scores(jnp.asarray(q), jnp.asarray(r_ts),
                                  n, n, tpen=1, tvpen=5,
                                  interpret=True)[0])
    s_tv = int(batch_align_scores(jnp.asarray(q), jnp.asarray(r_tv),
                                  n, n, tpen=1, tvpen=5,
                                  interpret=True)[0])
    assert s_ts == 5 * 2 - 1        # five matches, one transition
    assert s_tv == 5 * 2 - 5  # fixed-origin semiglobal: mismatch is paid
    # gold agreement for the same pairs
    want = batch_align_scores_reference(q, r_tv, [6], [6],
                                        tpen=1, tvpen=5)
    assert s_tv == want[0]


def test_ends_kernel_interpret(rng):
    """batch_align_ends (interpret) matches the XLA full-DP argmax."""
    from metagraph_tpu.align.pallas_dp import batch_align_ends
    from metagraph_tpu.align.batch_extender import _full_dp_ends
    import jax.numpy as jnp
    B, LQ, LR = 6, 17, 21
    q = rng.integers(1, 5, (B, LQ)).astype(np.int32)
    r = rng.integers(1, 5, (B, LR)).astype(np.int32)
    r[0, :LQ] = q[0]
    qlens = rng.integers(3, LQ + 1, B).astype(np.int32)
    rlens = rng.integers(3, LR + 1, B).astype(np.int32)
    got = np.asarray(batch_align_ends(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(qlens),
        jnp.asarray(rlens), interpret=True))
    want = np.asarray(_full_dp_ends(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(qlens),
        jnp.asarray(rlens), match=2, tpen=3, tvpen=3, open_p=5, ext_p=2))
    np.testing.assert_array_equal(got, want)
