"""Pallas TPU merge kernels: linear-time passes over sorted packed lanes.

The construction pipeline's dominant cost is re-sorting data that is
already sorted: the finish stage merges the (sorted) real-edge set with
(sorted) dummy-edge sets, tests membership between sorted key sets, and
compacts masked candidates — all previously expressed as full
``lax.sort`` calls (O(n log^2 n) comparator passes over every operand).
The reference does these as linear-time iterator merges on CPU threads
(metagraph/src/graph/representation/succinct/boss_chunk_construct.cpp:
233-306, common/sorted_sets/sorted_multiset.hpp). This module is the
TPU-native equivalent:

  * ``merge_sorted``    — one-pass merge of two sorted lane arrays
  * ``sort_packed``     — full sort: batched ``lax.sort`` leaf runs +
                          log2(N/leaf) segmented merge-kernel levels
  * ``partition_compact`` — one-pass stable compaction (keep-mask to
                          front), replacing the stable-sort formulation
                          of ``packed.compact``

Design (shared by merge_sorted and the segmented levels of sort_packed):
  * XLA side: merge-path diagonal splits — for every output chunk
    boundary g*C, a vectorized binary search finds how many elements of
    the A-side precede it in the merge; per-chunk window descriptors
    (A start, A length, B start in a reversed layout) are handed to the
    kernel as scalar-prefetch arrays. PAD (all-ones) tails act as +inf.
  * Pallas side: each side's window is covered by two adjacent
    C-aligned blocks whose indices come from the scalar-prefetch
    descriptors, so Mosaic streams ALL inputs with its own pipelining
    (no manual DMA). In-register: dynamic sublane+lane rolls trim the
    windows, B's window is reversed (index-XOR swap rounds), foreign
    elements become PAD, and the [A asc | B desc] bitonic sequence runs
    the log2(2C) exchange stages — sublane-reshape exchanges for
    strides >= 128, lane rotates below. Payload columns ride as extra
    lanes through every exchange.

The merged output is sorted; the relative order of *equal* keys is NOT
preserved (bitonic networks are unstable). Every call site in this
codebase only requires equal keys to be adjacent (dedupe, count
aggregation, run detection), never their original order.
``partition_compact`` IS stable (bit-shift compaction preserves order).

HBM traffic: read A + B once, write A+B once — vs. lax.sort's
log^2-pass round trips.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import packed

# Default chunk: output elements per grid step. 16384 = 128 rows of 128.
CHUNK = 16384
# Default leaf-run size for sort_packed (rows sorted by batched lax.sort
# before the merge levels take over).
LEAF = 1 << 17
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


def _segment_splits(x: jax.Array, run: int, chunk: int) -> Tuple[jax.Array,
                                                                 jax.Array,
                                                                 jax.Array]:
    """Window descriptors for one segmented-merge level over ``x``.

    ``x`` is (L, Np) holding Np/run sorted runs back to back (Np a
    multiple of chunk; run a multiple of chunk). Adjacent run pairs
    (2p, 2p+1) merge; a trailing lone run passes through. Returns
    (ae, ln, be): per output chunk, the A-window element start, the A
    length, and the B-window element start (both forward coordinates;
    the kernel reverses B's window in-register).
    """
    L, Np = x.shape
    G = Np // chunk
    S = run
    o = jnp.arange(G + 1, dtype=jnp.int32) * chunk
    p = o // (2 * S)
    d = o - p * (2 * S)
    lo = jnp.maximum(0, d - S)
    hi = jnp.minimum(d, S)
    steps = max(1, int(np.ceil(np.log2(S + 1))))

    def body(_, state):
        lo, hi = state
        active = lo < hi
        m = (lo + hi) >> 1
        ai = p * (2 * S) + m
        bi = p * (2 * S) + S + (d - m - 1)
        am = x[:, jnp.clip(ai, 0, Np - 1)]
        bm = x[:, jnp.clip(bi, 0, Np - 1)]
        le = _lex_le([am[j] for j in range(L)], [bm[j] for j in range(L)])
        # B positions beyond the array are +inf (ragged trailing pair)
        le = le | (bi >= Np)
        lo = jnp.where(active & le, m + 1, lo)
        hi = jnp.where(active & ~le, m, hi)
        return lo, hi

    m, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    # A consumed at the NEXT boundary, folded back into this pair: a
    # boundary landing exactly on the next pair start reports m=0 there
    # but means "all S A-elements consumed" here
    m_next = m[1:] + jnp.where(p[1:] != p[:-1], S, 0)
    ae = (p * (2 * S) + m)[:G]
    ln = (m_next - m[:-1]).astype(jnp.int32)
    b_lo = (d - m)[:G]
    rb0 = (p * (2 * S) + S)[:G]
    be = (rb0 + b_lo).astype(jnp.int32)     # forward B-window start
    return ae.astype(jnp.int32), ln, be


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


def _window(b0, b1, loc, R: int):
    """Assemble the C-element window starting at element ``loc`` of the
    two adjacent C-blocks [b0 | b1] ((R, 128) each): a dynamic sublane
    roll drops whole rows, a dynamic lane roll + next-row blend drops
    the remainder. All in-register — no manual DMA."""
    from jax.experimental.pallas import tpu as pltpu
    tr = loc // _LANE
    tl = loc % _LANE
    w = jnp.concatenate([b0, b1], axis=0)              # (2R, 128)
    rolled = pltpu.roll(w, 2 * R - tr, 0)[:R + 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    sh = (_LANE - tl) % _LANE
    same = pltpu.roll(rolled[:R], sh, 1)
    nxt = pltpu.roll(rolled[1:R + 1], sh, 1)
    return jnp.where(lane < _LANE - tl, same, nxt)


def _reverse_flat(x, R: int):
    """Reverse a (R, 128) array in flat row-major element order — i.e.
    element i moves to R*128-1-i. Index reversal is XOR with all ones:
    log2(R) static half-swaps on rows + 7 XOR-roll rounds on lanes.
    Used to turn an ascending B window descending in-register, instead
    of materializing a reversed copy of the whole array in HBM."""
    from jax.experimental.pallas import tpu as pltpu
    s = R // 2
    while s >= 1:                                       # rows: i ^= s
        n2 = R // (2 * s)
        v = x.reshape(n2, 2, s, _LANE)
        x = jnp.concatenate([v[:, 1], v[:, 0]], axis=1).reshape(R, _LANE)
        s //= 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    s = 64
    while s >= 1:                                       # lanes: i ^= s
        bit = (lane & s) != 0
        x = jnp.where(bit, pltpu.roll(x, s, 1), pltpu.roll(x, _LANE - s, 1))
        s //= 2
    return x


def _make_kernel(L: int, n_extra: int, C: int):
    """Descriptor-driven merge kernel with fully blocked, auto-pipelined
    I/O: each side's window is covered by two adjacent C-aligned blocks
    whose indices come from the scalar-prefetch descriptors, so Mosaic
    streams all inputs (double-buffered) while the exchange network
    runs. Payloads ride as extra lanes of the stacked inputs; lanes
    [0, L) are compared, the rest only move."""
    R = _rows(C)
    LT = L + n_extra

    def kernel(ae_ref, ln_ref, be_ref, a0, a1, b0, b1, out_ref):
        import jax.experimental.pallas as pl
        g = pl.program_id(0)
        la = ae_ref[g] % C
        lb = be_ref[g] % C
        len_a = ln_ref[g]
        full_a = len_a == C

        # pure-A chunks (the vast majority when one input is much
        # smaller, e.g. merging dummy edges into the real-edge set) skip
        # the exchange network: one window shift
        @pl.when(full_a)
        def _():
            for j in range(LT):
                out_ref[j] = _window(a0[j], a1[j], la, R)

        @pl.when(~full_a)
        def _():
            pos = (jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 0)
                   * _LANE
                   + jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1))
            in_a = pos < len_a
            # descending B window (reversed in-register from the forward
            # read): foreign elements sit in the first len_a slots and
            # must become +inf (PAD) to keep the combined sequence bitonic
            in_b = pos >= len_a
            keys, pays = [], []
            for j in range(LT):
                av = _window(a0[j], a1[j], la, R)
                bv = _reverse_flat(_window(b0[j], b1[j], lb, R), R)
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


def _stack_fwd(lanes_x, extras_x, L: int, slack: int):
    """(L+n_extra, rows, 128) forward layout with a PAD slack tail:
    window reads of R+1 rows starting at any valid element stay in
    bounds. Payload extras are bitcast to uint32 extra lanes."""
    cols = [lanes_x[j] for j in range(L)] + \
           [e.view(jnp.uint32) if e.dtype != jnp.uint32 else e
            for e in extras_x]
    x = jnp.stack(cols, axis=0)
    LT = x.shape[0]
    y = jnp.concatenate(
        [x, jnp.full((LT, slack), packed.PAD_LANE, jnp.uint32)], axis=1)
    return y.reshape(LT, y.shape[1] // _LANE, _LANE)


@functools.partial(jax.jit, static_argnames=("L", "chunk", "interpret",
                                             "out_elems"))
def _merge_call(fwd, rev, ae, ln, be, L: int, chunk: int, interpret: bool,
                out_elems: int = 0):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    LT = fwd.shape[0]
    n_extra = LT - L
    C = chunk
    R = _rows(C)
    G = out_elems // C

    kernel = _make_kernel(L, n_extra, C)
    blk = (LT, R, _LANE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(blk, lambda g, ae, ln, be: (0, ae[g] // C, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda g, ae, ln, be: (0, ae[g] // C + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda g, ae, ln, be: (0, be[g] // C, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda g, ae, ln, be: (0, be[g] // C + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk, lambda g, ae, ln, be: (0, g, 0),
                               memory_space=pltpu.VMEM),
    )
    res = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((LT, G * R, _LANE), jnp.uint32),
        interpret=interpret,
    )(ae, ln, be, fwd, fwd, rev, rev)
    return res.reshape(LT, G * C)


def _unstack(flat, L: int, edtypes):
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
    G = (pa + pb) // chunk
    ae = ai[:G]
    ln = ai[1:] - ai[:-1]
    be = jnp.arange(G, dtype=jnp.int32) * chunk - ae    # b_lo, forward
    fwd_a = _stack_fwd(a, a_extras, L, 2 * chunk)
    fwd_b = _stack_fwd(b, b_extras, L, 2 * chunk)
    edtypes = [e.dtype for e in a_extras]
    flat = _merge_call(fwd_a, fwd_b, ae, ln, be, L, chunk, interpret,
                       out_elems=pa + pb)
    lanes, extras = _unstack(flat, L, edtypes)
    if lanes.shape[1] != ntot:
        # padding slots sort to the tail, so clipping is exact
        lanes = lanes[:, :ntot]
        extras = tuple(e[:ntot] for e in extras)
    return lanes, extras


def sort_packed(x: jax.Array, *extras: jax.Array,
                chunk: int = CHUNK, leaf: int = LEAF,
                force_pallas: bool | None = None,
                interpret: bool = False,
                ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """Full sort of packed lanes + payloads: ``lax.sort`` on leaf runs
    (batched rows — far cheaper per element than one giant sort), then
    segmented merge-kernel levels. Replaces ``packed.sort`` on the TPU
    hot paths (the ips4o analog, boss_chunk_construct.cpp:280-306).

    NOT stable between equal keys (the reference's ips4o isn't either).
    PADs sort to the tail; payloads of PAD-keyed entries are unspecified
    (callers never read past the valid count). Payload dtypes must be
    4-byte.
    """
    extras = tuple(extras)
    use = force_pallas if force_pallas is not None else use_pallas()
    if not (use or interpret):
        s, es = packed.sort(x, *extras)
        return s, es
    leaf = max(leaf, chunk)
    assert leaf % chunk == 0 and (chunk & (chunk - 1)) == 0
    L, n = x.shape
    if n <= leaf:
        s, es = packed.sort(x, *extras)
        return s, es
    Np = -(-n // leaf) * leaf
    if Np != n:
        x = packed.pad_to(x, Np)
        extras = tuple(jnp.concatenate(
            [e, jnp.zeros((Np - n,), e.dtype)]) for e in extras)
    # leaf runs: one batched lax.sort over (Np/leaf, leaf) rows
    Gl = Np // leaf
    ops = tuple(x[j].reshape(Gl, leaf) for j in range(L)) + tuple(
        e.reshape(Gl, leaf) for e in extras)
    res = jax.lax.sort(ops, num_keys=L, is_stable=False)
    x = jnp.stack([r.reshape(Np) for r in res[:L]])
    extras = tuple(r.reshape(Np) for r in res[L:])
    edtypes = [e.dtype for e in extras]
    run = leaf
    while run < Np:
        ae, ln, be = _segment_splits(x, run, chunk)
        fwd = _stack_fwd(x, extras, L, 2 * chunk)
        flat = _merge_call(fwd, fwd, ae, ln, be, L, chunk, interpret,
                           out_elems=Np)
        x, extras = _unstack(flat, L, edtypes)
        run *= 2
    if Np != n:
        x = x[:, :n]
        extras = tuple(e[:n] for e in extras)
    return x, extras


# ---------------------------------------------------------------------------
# stable partition (compact) kernel
# ---------------------------------------------------------------------------
#
# packed.compact's "move kept elements to the front" was a stable 1-key
# lax.sort over every payload operand. Here it is a single streaming
# pass: each grid step compacts its chunk in VMEM via log2(C) rounds of
# power-of-two left shifts driven by the bit decomposition of each
# element's deficit (= dropped predecessors), then appends the kept run
# to the output through a row-aligned DMA with a one-row carry
# (sequential grid steps stitch the ragged boundaries). The classic
# bit-shift compaction is collision-free processing bits LSB->MSB;
# parity-tested against packed.compact in tests/test_merge.py.

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
    """Exclusive prefix sum of int32 (R, 128) in flat row-major order.

    Within-row scan by lane rolls; the cross-row exclusive scan is a
    strictly-lower-triangular matmul on the MXU (row sums <= chunk <<
    2^24, exact in f32) — Mosaic rejects the offset-row concatenates a
    shift-based row scan would need."""
    from jax.experimental.pallas import tpu as pltpu
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    incl = x
    s = 1
    while s < _LANE:
        sh = jnp.where(lane >= s, pltpu.roll(incl, s, 1), 0)
        incl = incl + sh
        s *= 2
    row_tot = incl[:, _LANE - 1:_LANE]                    # (R, 1)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    tri = (cols_i < rows_i).astype(jnp.float32)
    row_tot_b = jnp.broadcast_to(row_tot, (R, _LANE)).astype(jnp.float32)
    row_excl = jnp.dot(tri, row_tot_b,
                       preferred_element_type=jnp.float32).astype(jnp.int32)
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
        rows = jax.lax.broadcasted_iota(jnp.int32, (R + 1, _LANE), 0)
        nr = (off + cnt) // _LANE - row_lo
        cps = []
        for idx, x in enumerate(arrs):
            xp = jnp.concatenate([x, x[:1]], axis=0)       # (R+1,128)
            rolled = pltpu.roll(xp, t, 1)
            prev = jnp.concatenate([carry[idx], rolled[:R]], axis=0)
            y = jnp.where(lane >= t, rolled, prev)
            stage[idx] = y
            # carry = row nr of y (Mosaic has no dynamic_slice on TPU:
            # select the row with an iota compare + sublane reduce; the
            # reduce runs in int32 — Mosaic rejects unsigned reductions —
            # which is bit-exact here since only one row is nonzero)
            sel = jnp.where(rows == nr, y, jnp.uint32(0)).astype(jnp.int32)
            carry[idx] = jnp.sum(sel, axis=0, keepdims=True
                                 ).astype(jnp.uint32)
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
