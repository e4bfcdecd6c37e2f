"""Pallas TPU kernel: batched banded affine-gap alignment scoring.

The reference aligner's hot loop is the per-node column DP
(metagraph/src/graph/alignment/aligner_extender_methods.cpp ~200-700).
This kernel computes, for a whole batch of (query, reference) pairs at
once, the best semi-global affine-gap alignment score — the inner
primitive for batch re-scoring of candidate paths and for extension
scoring.

Kernel shape: grid over read tiles; each program holds (TILE_R, LQ+1)
H/I/D rows in registers/VMEM and sweeps the reference axis with a
`fori_loop`, so all per-step work is dense (TILE_R, LQ) VPU math:

  * substitution scores are computed arithmetically (match / transition
    |q-c|==2 / transversion) — no table gathers;
  * the in-row insertion recurrence I[j] = max_{j'<j} H[j'] - open -
    (j-j'-1)*ext is a running prefix-max computed with log2(LQ)
    shift+max steps (no scan primitive needed);
  * per-read lengths mask padded cells with -inf.

DNA codes: 0 = invalid/$, 1..4 = ACGT; transitions are code pairs with
|q - c| == 2 (A<->G, C<->T).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(10 ** 8)


def _subst(q, c, match: int, tpen: int, tvpen: int):
    """Arithmetic substitution score; q, c int32 arrays."""
    diff = jnp.abs(q - c)
    s = jnp.where(diff == 0, jnp.int32(match),
                  jnp.where(diff == 2, jnp.int32(-tpen), jnp.int32(-tvpen)))
    return jnp.where((q == 0) | (c == 0), jnp.int32(-tvpen), s)


def _running_prefix_max(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix-max along the last axis via log2 steps."""
    n = x.shape[-1]
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [jnp.full(x.shape[:-1] + (s,), NEG, x.dtype), x[..., :-s]],
            axis=-1)
        x = jnp.maximum(x, shifted)
        s *= 2
    return x


def _dp_step(H, D, q_codes, c, jj, match, tpen, tvpen, open_p, ext_p):
    """One reference-character step of the affine DP for a row batch.

    H, D: (R, LQ+1); q_codes: (R, LQ); c: (R, 1) current ref chars.
    Returns (H', D')."""
    subs = _subst(q_codes, c, match, tpen, tvpen)          # (R, LQ)
    Dn = jnp.maximum(H - open_p, D - ext_p)
    diag = H[:, :-1] + subs
    Hn = jnp.concatenate([Dn[:, :1], jnp.maximum(diag, Dn[:, 1:])], axis=1)
    # insertions within the row: I[j] = max_{j'<j} Hn[j'] + j'*ext - open
    #                                   - (j-1)*ext
    aug = Hn + jj * ext_p
    run = _running_prefix_max(aug)
    shifted = jnp.concatenate(
        [jnp.full((Hn.shape[0], 1), NEG, Hn.dtype), run[:, :-1]], axis=1)
    I = shifted - jj * ext_p - (open_p - ext_p)
    return jnp.maximum(Hn, I), Dn


def _first_argmax(H, jj, mask):
    """(R, 1) row max and the smallest j attaining it (np.argmax tie rule)."""
    Hm = jnp.where(mask, H, NEG)
    m = jnp.max(Hm, axis=1, keepdims=True)
    BIG = jnp.int32(1 << 30)
    j = jnp.min(jnp.where(Hm == m, jj, BIG), axis=1, keepdims=True)
    return m, j


def _score_kernel(q_ref, r_ref, qlen_ref, rlen_ref, out_ref,
                  *, LQ: int, LR: int, match: int, tpen: int, tvpen: int,
                  open_p: int, ext_p: int, with_ends: bool = False):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    R = q_ref.shape[0]
    q_codes = q_ref[:, :].astype(jnp.int32)
    qlen = qlen_ref[:, :].astype(jnp.int32)       # (R, 1)
    rlen = rlen_ref[:, :].astype(jnp.int32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (R, LQ + 1), 1)
    j_valid = jj <= qlen                           # query prefix mask
    H0 = jnp.where(jj == 0, 0, -open_p - (jj - 1) * ext_p)
    H0 = jnp.where(j_valid, H0, NEG)
    D0 = jnp.full((R, LQ + 1), NEG, jnp.int32)

    # Mosaic cannot dynamically index the lane dimension; instead carry the
    # ref tile through the loop and rotate it one column per step so the
    # current character is always the (static) first column.
    from jax.experimental.pallas import tpu as pltpu
    _roll = lambda x: pltpu.roll(x, shift=LR - 1, axis=1)  # left-rotate by 1

    def body(t, state):
        H, D, best, bt, bj, refbuf = state
        c = refbuf[:, 0:1].astype(jnp.int32)
        refbuf = _roll(refbuf)
        Hn, Dn = _dp_step(H, D, q_codes, c, jj, match, tpen, tvpen,
                          open_p, ext_p)
        Hn = jnp.where(j_valid, Hn, NEG)
        t_valid = (t < rlen)                       # (R, 1)
        Hn = jnp.where(t_valid, Hn, H)
        Dn = jnp.where(t_valid, Dn, D)
        m, j = _first_argmax(Hn, jj, j_valid & t_valid)
        # strictly-greater update keeps the earliest (t, j) — the same
        # row-major first-max tie rule as np.argmax over the H matrix
        upd = m > best
        best = jnp.where(upd, m, best)
        bt = jnp.where(upd, t + 1, bt)
        bj = jnp.where(upd, j, bj)
        return Hn, Dn, best, bt, bj, refbuf

    best0, bj0 = _first_argmax(H0, jj, j_valid)
    bt0 = jnp.zeros((R, 1), jnp.int32)
    refbuf0 = r_ref[:, :]
    H, D, best, bt, bj, _ = jax.lax.fori_loop(
        0, LR, body, (H0, D0, best0, bt0, bj0, refbuf0))
    if with_ends:
        out_ref[:, :] = jnp.concatenate([best, bt, bj], axis=1)
    else:
        out_ref[:, :] = best


@functools.partial(jax.jit, static_argnames=(
    "match", "tpen", "tvpen", "open_p", "ext_p", "interpret"))
def batch_align_scores(queries: jnp.ndarray, refs: jnp.ndarray,
                       qlens: jnp.ndarray, rlens: jnp.ndarray,
                       match: int = 2, tpen: int = 3, tvpen: int = 3,
                       open_p: int = 5, ext_p: int = 2,
                       interpret: bool = False) -> jnp.ndarray:
    """(R,) best semi-global affine scores for R (query, ref) pairs.

    queries (R, LQ) / refs (R, LR): 0-padded int codes; qlens/rlens the
    true lengths. Runs the Pallas kernel (interpret=True for CPU tests).
    """
    from jax.experimental import pallas as pl

    R, LQ = queries.shape
    LR = refs.shape[1]
    TILE_R = min(8, R)
    R_pad = -(-R // TILE_R) * TILE_R
    qp = jnp.zeros((R_pad, LQ), jnp.int32).at[:R].set(
        queries.astype(jnp.int32))
    rp = jnp.zeros((R_pad, LR), jnp.int32).at[:R].set(refs.astype(jnp.int32))
    ql = jnp.zeros((R_pad, 1), jnp.int32).at[:R, 0].set(
        qlens.astype(jnp.int32))
    rl = jnp.zeros((R_pad, 1), jnp.int32).at[:R, 0].set(
        rlens.astype(jnp.int32))

    kernel = functools.partial(
        _score_kernel, LQ=LQ, LR=LR, match=match, tpen=tpen, tvpen=tvpen,
        open_p=open_p, ext_p=ext_p)
    grid = (R_pad // TILE_R,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, 1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_R, LQ), lambda i: (i, 0)),
            pl.BlockSpec((TILE_R, LR), lambda i: (i, 0)),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0)),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_R, 1), lambda i: (i, 0)),
        interpret=interpret,
    )(qp, rp, ql, rl)
    return out[:R, 0]


@functools.partial(jax.jit, static_argnames=(
    "match", "tpen", "tvpen", "open_p", "ext_p", "interpret"))
def batch_align_ends(queries: jnp.ndarray, refs: jnp.ndarray,
                     qlens: jnp.ndarray, rlens: jnp.ndarray,
                     match: int = 2, tpen: int = 3, tvpen: int = 3,
                     open_p: int = 5, ext_p: int = 2,
                     interpret: bool = False) -> jnp.ndarray:
    """(R, 3) [best score, r_end, q_end] per (query, ref) pair.

    Ends follow np.argmax's row-major first-max tie rule over the full H
    matrix, so results are bit-identical to the XLA full-DP path
    (batch_extender._full_dp + host argmax) — the production scoring
    engine for score-only alignment (query --align / server align),
    where no CIGAR and therefore no (B, LR, LQ) matrix transfer is
    needed."""
    from jax.experimental import pallas as pl

    R, LQ = queries.shape
    LR = refs.shape[1]
    TILE_R = min(8, R)
    R_pad = -(-R // TILE_R) * TILE_R
    qp = jnp.zeros((R_pad, LQ), jnp.int32).at[:R].set(
        queries.astype(jnp.int32))
    rp = jnp.zeros((R_pad, LR), jnp.int32).at[:R].set(refs.astype(jnp.int32))
    ql = jnp.zeros((R_pad, 1), jnp.int32).at[:R, 0].set(
        qlens.astype(jnp.int32))
    rl = jnp.zeros((R_pad, 1), jnp.int32).at[:R, 0].set(
        rlens.astype(jnp.int32))

    kernel = functools.partial(
        _score_kernel, LQ=LQ, LR=LR, match=match, tpen=tpen, tvpen=tvpen,
        open_p=open_p, ext_p=ext_p, with_ends=True)
    grid = (R_pad // TILE_R,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, 3), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_R, LQ), lambda i: (i, 0)),
            pl.BlockSpec((TILE_R, LR), lambda i: (i, 0)),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0)),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_R, 3), lambda i: (i, 0)),
        interpret=interpret,
    )(qp, rp, ql, rl)
    return out[:R]


def batch_align_scores_reference(queries, refs, qlens, rlens,
                                 match=2, tpen=3, tvpen=3, open_p=5,
                                 ext_p=2) -> np.ndarray:
    """Pure-numpy gold implementation (same semantics) for testing."""
    from .aligner import AlignerConfig, affine_semiglobal
    cfg = AlignerConfig(match_score=match, mm_transition_penalty=tpen,
                        mm_transversion_penalty=tvpen,
                        gap_opening_penalty=open_p,
                        gap_extension_penalty=ext_p)
    sub = cfg.score_matrix()
    out = []
    for i in range(len(queries)):
        q = np.asarray(queries[i][:qlens[i]], np.int32)
        r = np.asarray(refs[i][:rlens[i]], np.int32)
        score, _, _, _ = affine_semiglobal(q, r, sub, open_p, ext_p)
        out.append(score)
    return np.array(out)
