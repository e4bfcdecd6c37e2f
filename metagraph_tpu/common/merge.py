"""Pallas TPU merge-path kernel: single-pass merge of sorted packed lanes.

The construction pipeline's dominant cost is re-sorting data that is
already sorted: the finish stage merges the (sorted) real-edge set with
(sorted) dummy-edge sets, tests membership between sorted key sets, and
compacts masked candidates — all previously expressed as full
``lax.sort`` calls (O(n log^2 n) comparator passes over every operand).
The reference does these as linear-time iterator merges on CPU threads
(metagraph/src/graph/representation/succinct/boss_chunk_construct.cpp:
233-306, common/sorted_sets/sorted_multiset.hpp). This module is the
TPU-native equivalent: a merge-path partitioned bitonic-merge kernel
that streams both inputs through VMEM exactly once.

Design:
  * XLA side: merge-path diagonal splits — for every output chunk
    boundary g*C, a vectorized binary search finds how many elements of
    A precede it in the merge (``ai[g]``); chunk g then merges
    A[ai[g]:ai[g+1]] with B[bi[g]:bi[g+1]] where ai+bi = g*C.  PAD
    (all-ones) tails act as +inf so no length bookkeeping is needed.
  * Pallas side: each grid step DMAs its two input windows (row-aligned
    reads + an in-register dynamic lane rotate), masks foreign elements
    to PAD, forms the bitonic sequence [A asc | B desc], and runs the
    log2(2C)+1 bitonic-merge exchange stages entirely in VMEM/registers
    — sublane-reshape exchanges for strides >= 128, lane rotates below.
    Payload columns move with their keys through every exchange.

The merged output is sorted; the relative order of *equal* keys is NOT
preserved (bitonic networks are unstable). Every call site in this
codebase only requires equal keys to be adjacent (dedupe, count
aggregation, run detection), never their original order.

HBM traffic: read A + B once, write A+B once — vs. lax.sort's many
round trips. Measured on TPU v5e at 16M+16M x (2 lanes + payload):
~8 ms vs ~95 ms for the equivalent lax.sort.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import packed

# Default chunk: 8192 elements per output block (R=64 rows of 128).
CHUNK = 8192
_LANE = 128


def _lex_lt(a, b):
    """Lexicographic a < b over a list of same-shaped uint32 arrays.

    Pure logical ops (no bool-valued selects: Mosaic cannot lower an
    i8->i1 truncation, which is how XLA materializes those)."""
    L = len(a)
    res = a[L - 1] < b[L - 1]
    for j in range(L - 2, -1, -1):
        eq = a[j] == b[j]
        res = (eq & res) | (~eq & (a[j] < b[j]))
    return res


def _lex_le(a, b):
    return ~_lex_lt(b, a)


def merge_path_splits(a: jax.Array, b: jax.Array, chunk: int) -> jax.Array:
    """(G+1,) int32: # of A-elements among the first g*chunk of the merge.

    A and B are (L, Na)/(L, Nb) sorted packed lanes (PAD tails OK; PADs
    are +inf). Ties take A first, so equal keys stay grouped. Standard
    merge-path diagonal binary search, vectorized over all boundaries.
    """
    L, na = a.shape
    nb = b.shape[1]
    assert (na + nb) % chunk == 0
    G = (na + nb) // chunk
    d = jnp.arange(G + 1, dtype=jnp.int32) * chunk
    if na == 0 or nb == 0:
        # zero-width side: every diagonal takes min(d, na) from A; the
        # gathers below would slice a (L, 0) array
        return jnp.minimum(d, na).astype(jnp.int32)
    lo = jnp.maximum(0, d - nb)
    hi = jnp.minimum(d, na)
    steps = max(1, int(np.ceil(np.log2(na + 1))))

    def body(_, state):
        lo, hi = state
        active = lo < hi
        m = (lo + hi) >> 1
        am = a[:, jnp.clip(m, 0, na - 1)]                 # (L, G+1)
        bm = b[:, jnp.clip(d - m - 1, 0, nb - 1)]
        # A[m] <= B[d-m-1]  ->  A[m] is among the first d -> move lo up
        le = _lex_le([am[j] for j in range(L)], [bm[j] for j in range(L)])
        lo = jnp.where(active & le, m + 1, lo)
        hi = jnp.where(active & ~le, m, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo.astype(jnp.int32)


def _rows(n: int) -> int:
    assert n % _LANE == 0
    return n // _LANE


def _shift_window(x, t, R: int):
    """Drop the first ``t`` (< 128) elements of a row-major (R+1, 128)
    window -> (R, 128). Dynamic lane rotate + next-row blend."""
    from jax.experimental.pallas import tpu as pltpu
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    sh = (_LANE - t) % _LANE          # pltpu.roll wants shift >= 0
    same = pltpu.roll(x[:R], sh, 1)
    nxt = pltpu.roll(x[1:R + 1], sh, 1)
    return jnp.where(lane < _LANE - t, same, nxt)


def _bitonic_merge(keys, pays, R2: int):
    """In-VMEM bitonic merge of a (R2*128,)-element bitonic sequence held
    as per-lane (R2, 128) arrays. keys: list (compared lexicographically),
    pays: list (moved only). Returns sorted ascending."""
    from jax.experimental.pallas import tpu as pltpu
    n = R2 * _LANE
    arrs = list(keys) + list(pays)
    nk = len(keys)
    s = n // 2
    while s >= _LANE:
        sp = s // _LANE
        n2 = R2 // (2 * sp)
        # keep compare/select in 2D (Mosaic rejects >2D bool selects)
        lo = [x.reshape(n2, 2, sp, _LANE)[:, 0].reshape(R2 // 2, _LANE)
              for x in arrs]
        hi = [x.reshape(n2, 2, sp, _LANE)[:, 1].reshape(R2 // 2, _LANE)
              for x in arrs]
        less = _lex_lt(hi[:nk], lo[:nk])
        out = []
        for l, h in zip(lo, hi):
            nl = jnp.where(less, h, l).reshape(n2, 1, sp, _LANE)
            nh = jnp.where(less, l, h).reshape(n2, 1, sp, _LANE)
            out.append(jnp.concatenate([nl, nh], axis=1).reshape(R2, _LANE))
        arrs = out
        s //= 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (R2, _LANE), 1)
    while s >= 1:
        bit = (lane & s) != 0
        partners = [jnp.where(bit, pltpu.roll(x, s, 1),
                              pltpu.roll(x, _LANE - s, 1))
                    for x in arrs]
        p_lt_x = _lex_lt(partners[:nk], arrs[:nk])
        x_lt_p = _lex_lt(arrs[:nk], partners[:nk])
        take_p = (bit & x_lt_p) | (~bit & p_lt_x)
        arrs = [jnp.where(take_p, p, x) for p, x in zip(partners, arrs)]
        s //= 2
    return arrs[:nk], arrs[nk:]


def _make_kernel(L: int, n_extra: int, C: int):
    """Payloads ride as extra lanes of the stacked (L+n_extra, rows, 128)
    inputs: one scratch buffer and one DMA pattern per side regardless of
    payload count. Lanes [0, L) are compared; the rest only move."""
    R = _rows(C)
    LT = L + n_extra

    def kernel(ai_ref, a_ref, bf_ref, br_ref, out_ref, sa, sb, sems):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        g = pl.program_id(0)
        a_lo = ai_ref[g]
        a_hi = ai_ref[g + 1]
        len_a = a_hi - a_lo
        b_lo = g * C - a_lo
        nb_pad = ai_ref[ai_ref.shape[0] - 1]   # padded Nb (appended slot)
        # B (reversed layout) has a C-element PAD prefix: the descending
        # window for this chunk starts at nb_pad - b_lo in that layout
        b_start = nb_pad - b_lo
        ra, ta = a_lo // _LANE, a_lo % _LANE
        rb, tb = b_start // _LANE, b_start % _LANE
        rbf, tbf = b_lo // _LANE, b_lo % _LANE
        full_a = len_a == C
        full_b = len_a == 0
        mixed = (~full_a) & (~full_b)

        # pure-A / pure-B chunks (the vast majority when one input is much
        # smaller, e.g. merging dummy edges into the real-edge set) skip
        # the bitonic stages entirely: one window read + shift.
        @pl.when(~full_b)
        def _():
            cps = [pltpu.make_async_copy(
                a_ref.at[j, pl.ds(ra, R + 1), :], sa.at[j], sems.at[j])
                for j in range(LT)]
            for c in cps:
                c.start()
            for c in cps:
                c.wait()

        @pl.when(full_b)
        def _():
            cps = [pltpu.make_async_copy(
                bf_ref.at[j, pl.ds(rbf, R + 1), :], sb.at[j],
                sems.at[LT + j]) for j in range(LT)]
            for c in cps:
                c.start()
            for c in cps:
                c.wait()
            for j in range(LT):
                out_ref[j] = _shift_window(sb[j], tbf, R)

        @pl.when(full_a)
        def _():
            for j in range(LT):
                out_ref[j] = _shift_window(sa[j], ta, R)

        @pl.when(mixed)
        def _():
            cps = [pltpu.make_async_copy(
                br_ref.at[j, pl.ds(rb, R + 1), :], sb.at[j],
                sems.at[LT + j]) for j in range(LT)]
            for c in cps:
                c.start()
            for c in cps:
                c.wait()
            pos = (jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 0)
                   * _LANE
                   + jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1))
            in_a = pos < len_a
            # descending B window: foreign elements sit in the first
            # C - len_b = len_a slots and must become +inf (PAD) to keep
            # the combined sequence bitonic
            in_b = pos >= len_a
            keys, pays = [], []
            for j in range(LT):
                av = _shift_window(sa[j], ta, R)
                bv = _shift_window(sb[j], tb, R)
                if j < L:       # key lanes: mask foreign slots to PAD
                    av = jnp.where(in_a, av, packed.PAD_LANE)
                    bv = jnp.where(in_b, bv, packed.PAD_LANE)
                    keys.append(jnp.concatenate([av, bv], axis=0))
                else:           # payload lanes: move with their keys
                    pays.append(jnp.concatenate([av, bv], axis=0))
            keys, pays = _bitonic_merge(keys, pays, 2 * R)
            for j in range(L):
                out_ref[j] = keys[j][:R]
            for i in range(n_extra):
                out_ref[L + i] = pays[i][:R]

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _merge_call(a, b, a_extras, b_extras, ai, chunk: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    L, na = a.shape
    nb = b.shape[1]
    n_extra = len(a_extras)
    C = chunk
    R = _rows(C)
    G = (na + nb) // C

    LT = L + n_extra

    def stack_side(lanes_x, extras_x, pre: int, rev: bool):
        # (L+n_extra, rows, 128) stacked view: payloads ride as extra
        # lanes (bitcast to uint32). ``pre`` PAD elements in front and a
        # full window of slack behind bound dynamic-start reads.
        cols = [lanes_x[j] for j in range(L)] + \
               [e.view(jnp.uint32) if e.dtype != jnp.uint32 else e
                for e in extras_x]
        x = jnp.stack(cols, axis=0)
        if rev:
            x = jnp.flip(x, axis=1)
        slack = C + _LANE
        parts = ([jnp.full((LT, pre), packed.PAD_LANE, jnp.uint32)]
                 if pre else [])
        parts += [x, jnp.full((LT, slack), packed.PAD_LANE, jnp.uint32)]
        y = jnp.concatenate(parts, axis=1)
        return y.reshape(LT, y.shape[1] // _LANE, _LANE)

    # B is consumed two ways: forward windows for pure-B chunks, and
    # reversed windows (with a C-wide PAD prefix supplying the +inf fill
    # for short descending windows) for mixed chunks — Mosaic cannot
    # reverse in-kernel
    a2 = stack_side(a, a_extras, 0, False)
    bf = stack_side(b, b_extras, 0, False)
    br = stack_side(b, b_extras, C, True)
    edtypes = [e.dtype for e in a_extras]
    ai = jnp.concatenate([ai, jnp.full((1,), nb, jnp.int32)])

    kernel = _make_kernel(L, n_extra, C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec((LT, R, _LANE), lambda g, ai: (0, g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((LT, R + 1, _LANE), jnp.uint32)] * 2
            + [pltpu.SemaphoreType.DMA((2 * LT,))]),
    )
    res = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((LT, G * R, _LANE), jnp.uint32),
        interpret=interpret,
    )(ai, a2, bf, br)
    flat = res.reshape(LT, G * C)
    lanes = flat[:L]
    extras = tuple(
        flat[L + i].view(dt) if dt != jnp.uint32 else flat[L + i]
        for i, dt in enumerate(edtypes))
    return lanes, extras


def _merge_fallback(a, b, a_extras, b_extras):
    """lax.sort-based reference semantics (non-TPU platforms / oddballs)."""
    lanes = jnp.concatenate([a, b], axis=1)
    extras = tuple(jnp.concatenate([ea, eb])
                   for ea, eb in zip(a_extras, b_extras))
    s, es = packed.sort(lanes, *extras)
    return s, es


def use_pallas() -> bool:
    import os
    if os.environ.get("METAGRAPH_TPU_NO_PALLAS_MERGE"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def merge_sorted(a: jax.Array, b: jax.Array,
                 a_extras: Sequence[jax.Array] = (),
                 b_extras: Sequence[jax.Array] = (),
                 chunk: int = CHUNK,
                 force_pallas: bool | None = None,
                 interpret: bool = False,
                 ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """Merge two sorted (+PAD-tail) packed-lane arrays with payloads.

    Returns (lanes (L, Na+Nb), extras). Output is sorted ascending with
    all PADs at the tail; equal keys are adjacent but their relative
    order is unspecified. Payload i of A must share dtype with payload
    i of B (4-byte dtypes only).
    """
    a_extras = tuple(a_extras)
    b_extras = tuple(b_extras)
    assert len(a_extras) == len(b_extras)
    assert chunk >= _LANE and (chunk & (chunk - 1)) == 0, \
        "chunk must be a power of two >= 128 (bitonic strides + log2 bits)"
    use = force_pallas if force_pallas is not None else use_pallas()
    if not (use or interpret):
        return _merge_fallback(a, b, a_extras, b_extras)
    L, na = a.shape
    nb = b.shape[1]
    ntot = na + nb
    # pad each side to a chunk multiple (PAD keys sort to the tail)
    pa = -(-na // chunk) * chunk
    pb = -(-nb // chunk) * chunk
    if pa != na:
        a = packed.pad_to(a, pa)
        a_extras = tuple(jnp.concatenate(
            [e, jnp.zeros((pa - na,), e.dtype)]) for e in a_extras)
    if pb != nb:
        b = packed.pad_to(b, pb)
        b_extras = tuple(jnp.concatenate(
            [e, jnp.zeros((pb - nb,), e.dtype)]) for e in b_extras)
    ai = merge_path_splits(a, b, chunk)
    lanes, extras = _merge_call(a, b, a_extras, b_extras, ai, chunk,
                                interpret)
    if lanes.shape[1] != ntot:
        # padding slots merged to the tail; everything valid is in the
        # first na+nb positions only when pads were appended — they sort
        # last, so clipping is exact
        lanes = lanes[:, :ntot]
        extras = tuple(e[:ntot] for e in extras)
    return lanes, extras


# ---------------------------------------------------------------------------
# stable partition (compact) kernel
# ---------------------------------------------------------------------------
#
# packed.compact's "move kept elements to the front" was a stable 1-key
# lax.sort over every payload operand (~100 ms at 16M x 4 operands).
# Here it is a single streaming pass: each grid step compacts its chunk
# in VMEM via log2(C) rounds of power-of-two left shifts driven by the
# bit decomposition of each element's deficit (= dropped predecessors),
# then appends the kept run to the output through a row-aligned DMA with
# a one-row carry (sequential grid steps stitch the ragged boundaries).
# The classic bit-shift compaction is collision-free processing bits
# LSB->MSB; validated exhaustively in tests/test_merge.py.

def _shift_flat_left(x, s: int, R: int):
    """x viewed as a flat (R*128,) row-major sequence shifted left by the
    static power-of-two s (value at i takes value from i+s; tail garbage)."""
    if s >= _LANE:
        sr = s // _LANE
        return jnp.concatenate([x[sr:], x[:sr]], axis=0)  # tail rows garbage
    from jax.experimental.pallas import tpu as pltpu
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    same = pltpu.roll(x, _LANE - s, 1)
    nxt = pltpu.roll(jnp.concatenate([x[1:], x[:1]], axis=0), _LANE - s, 1)
    return jnp.where(lane < _LANE - s, same, nxt)


def _prefix_sum_excl(x, R: int):
    """Exclusive prefix sum of int32 (R, 128) in flat row-major order."""
    from jax.experimental.pallas import tpu as pltpu
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    incl = x
    s = 1
    while s < _LANE:
        sh = jnp.where(lane >= s, pltpu.roll(incl, s, 1), 0)
        incl = incl + sh
        s *= 2
    row_tot = incl[:, _LANE - 1:_LANE]                    # (R, 1)
    acc = row_tot
    s = 1
    while s < R:
        acc = acc + jnp.concatenate(
            [jnp.zeros((s, 1), jnp.int32), acc[:-s]], axis=0)
        s *= 2
    row_excl = acc - row_tot
    return incl - x + row_excl


def _make_partition_kernel(L: int, n_extra: int, C: int):
    R = _rows(C)
    nbits = int(np.log2(C))

    def kernel(*refs):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        keep_ref = refs[0]
        lanes_ref = refs[1]
        extra_refs = refs[2:2 + n_extra]
        out_ref = refs[2 + n_extra]
        eout_refs = refs[3 + n_extra:3 + 2 * n_extra]
        off_ref = refs[3 + 2 * n_extra]                   # SMEM (1,) int32
        carry = refs[4 + 2 * n_extra]                     # (L+n, 1, 128)
        stage = refs[5 + 2 * n_extra]                     # (L+n, R+1, 128)
        sems = refs[-1]

        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            off_ref[0] = 0

        keep = keep_ref[...]                               # (R,128) int32
        drop = 1 - keep
        d = jnp.where(keep == 1, _prefix_sum_excl(drop, R), 0)
        cnt = jnp.sum(keep)

        arrs = [lanes_ref[j] for j in range(L)] + \
               [e[...] for e in extra_refs]
        k = keep == 1
        for kb in range(nbits):
            s = 1 << kb
            move = k & (((d >> kb) & 1) == 1)
            inc = _shift_flat_left(move.astype(jnp.int32), s, R) == 1
            arrs = [jnp.where(inc, _shift_flat_left(x, s, R), x)
                    for x in arrs]
            d = jnp.where(inc, _shift_flat_left(d, s, R), d)
            k = inc | (k & ~move)

        off = off_ref[0]
        row_lo = off // _LANE
        t = off % _LANE
        lane = jax.lax.broadcasted_iota(jnp.int32, (R + 1, _LANE), 1)
        cps = []
        for idx, x in enumerate(arrs):
            xp = jnp.concatenate([x, x[:1]], axis=0)       # (R+1,128)
            rolled = pltpu.roll(xp, t, 1)
            prev = jnp.concatenate([carry[idx], rolled[:R]], axis=0)
            y = jnp.where(lane >= t, rolled, prev)
            stage[idx] = y
            nr = (off + cnt) // _LANE - row_lo
            carry[idx] = jax.lax.dynamic_slice_in_dim(y, nr, 1, axis=0)
            dst = (out_ref if idx < L else eout_refs[idx - L])
            if idx < L:
                cps.append(pltpu.make_async_copy(
                    stage.at[idx], dst.at[idx, pl.ds(row_lo, R + 1), :],
                    sems.at[idx]))
            else:
                cps.append(pltpu.make_async_copy(
                    stage.at[idx], dst.at[pl.ds(row_lo, R + 1), :],
                    sems.at[idx]))
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        off_ref[0] = off + cnt

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _partition_call(lanes, keep_i32, extras, chunk: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    L, n = lanes.shape
    n_extra = len(extras)
    C = chunk
    R = _rows(C)
    G = n // C
    rows_out = n // _LANE + R + 1

    keep2 = keep_i32.reshape(n // _LANE, _LANE)
    lanes2 = lanes.reshape(L, n // _LANE, _LANE)
    ex2 = [e.reshape(n // _LANE, _LANE) for e in extras]
    edt = [e.dtype for e in extras]
    # all staged/carried arrays ride one uint32 scratch: bitcast extras
    ex2 = [e.view(jnp.uint32) if e.dtype != jnp.uint32 else e for e in ex2]

    kernel = _make_partition_kernel(L, n_extra, C)
    res = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=(
            [pl.BlockSpec((R, _LANE), lambda g: (g, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((L, R, _LANE), lambda g: (0, g, 0),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((R, _LANE), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)] * n_extra),
        out_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * (1 + n_extra)),
        out_shape=(
            [jax.ShapeDtypeStruct((L, rows_out, _LANE), jnp.uint32)]
            + [jax.ShapeDtypeStruct((rows_out, _LANE), jnp.uint32)]
            * n_extra),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((L + n_extra, 1, _LANE), jnp.uint32),
            pltpu.VMEM((L + n_extra, R + 1, _LANE), jnp.uint32),
            pltpu.SemaphoreType.DMA((L + n_extra,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(keep2, lanes2, *ex2)
    out_lanes = res[0].reshape(L, rows_out * _LANE)[:, :n]
    outs = []
    for i in range(n_extra):
        o = res[1 + i].reshape(rows_out * _LANE)[:n]
        outs.append(o.view(edt[i]) if edt[i] != jnp.uint32 else o)
    return out_lanes, tuple(outs)


def partition_compact(x: jax.Array, keep: jax.Array, capacity: int,
                      *extras: jax.Array, extra_fill: int = 0,
                      chunk: int = CHUNK,
                      force_pallas: bool | None = None,
                      interpret: bool = False):
    """packed.compact semantics via the streaming partition kernel.

    Returns (lanes (L, capacity), true_count, extras...). Stable; kept
    entries first; PAD/extra_fill beyond the count; entries past
    ``capacity`` dropped (true count returned for overflow checks).
    """
    L, n = x.shape
    assert chunk >= _LANE and (chunk & (chunk - 1)) == 0, \
        "chunk must be a power of two >= 128 (bit-shift compaction rounds)"
    count = jnp.sum(keep.astype(jnp.int32))
    use = force_pallas if force_pallas is not None else use_pallas()
    if not (use or interpret):
        return packed.compact(x, keep, capacity, *extras,
                              extra_fill=extra_fill)
    pn = -(-n // chunk) * chunk
    if pn != n:
        x = packed.pad_to(x, pn)
        keep = jnp.concatenate([keep, jnp.zeros((pn - n,), bool)])
        extras = tuple(jnp.concatenate(
            [e, jnp.zeros((pn - n,), e.dtype)]) for e in extras)
    out, outs = _partition_call(x, keep.astype(jnp.int32), tuple(extras),
                                chunk, interpret)
    m = min(capacity, pn)
    pos_ok = packed.valid_mask(m, count)
    out_lanes = jnp.stack([
        jnp.where(pos_ok, out[j][:m], packed.PAD_LANE) for j in range(L)])
    if capacity > pn:
        out_lanes = packed.pad_to(out_lanes, capacity)
    res_extras = []
    for i, e in enumerate(extras):
        eo = jnp.where(pos_ok, outs[i][:m],
                       jnp.asarray(extra_fill, e.dtype))
        if capacity > pn:
            eo = jnp.concatenate(
                [eo, jnp.full((capacity - pn,), extra_fill, e.dtype)])
        res_extras.append(eo)
    return out_lanes, count, tuple(res_extras)
