"""Batched device beam-search extension for the aligner.

The reference extends each seed with a per-read column DP over a graph
BFS (DefaultColumnExtender, aligner_extender_methods.hpp:43-119) and
batches only across threads (DBGAligner::align_batch, dbg_aligner.hpp:160).
Here the whole read batch extends in lockstep on the device:

  * state: (B reads x W beam entries) DP columns H/D of width LQ+1 —
    dense VPU math for every candidate in parallel;
  * per step: ONE batched successor lookup for all B*W frontier nodes,
    a vectorized affine-DP column update for all B*W*4 candidate edges,
    and a per-read top-W selection (lax.top_k) with x-drop pruning;
  * the whole walk is one `lax.scan` that also records per-step
    (parent beam, character) choices, so the winning path is recovered
    with an O(steps) vectorized host traceback — no per-read Python DP;
  * CIGARs come from one batched full-DP (device) over (tail, winning
    path spelling) pairs plus an O(L) host argmax walk per read.

This replaces the round-1 per-read Python beam search
(align/aligner.py:_search) on the batch path.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(10 ** 8)


def _subst(q, c, match, tpen, tvpen):
    diff = jnp.abs(q - c)
    s = jnp.where(diff == 0, jnp.int32(match),
                  jnp.where(diff == 2, jnp.int32(-tpen), jnp.int32(-tvpen)))
    return jnp.where((q == 0) | (c == 0), jnp.int32(-tvpen), s)


def _prefix_max(x):
    n = x.shape[-1]
    s = 1
    while s < n:
        pad = jnp.full(x.shape[:-1] + (s,), NEG, x.dtype)
        x = jnp.maximum(x, jnp.concatenate([pad, x[..., :-s]], axis=-1))
        s *= 2
    return x


def _column_update(H, D, q, c, jj, match, tpen, tvpen, open_p, ext_p,
                   with_insertions: bool = True):
    """One DP column step. H, D: (..., LQ+1); q: (..., LQ); c: (..., 1).
    Returns (Hn, Dn, I)."""
    subs = _subst(q, c, match, tpen, tvpen)
    Dn = jnp.maximum(H - open_p, D - ext_p)
    diag = H[..., :-1] + subs
    # broadcast Dn over any extra candidate axes introduced by subs
    Dn = jnp.broadcast_to(Dn, diag.shape[:-1] + (Dn.shape[-1],))
    Hn = jnp.concatenate([Dn[..., :1], jnp.maximum(diag, Dn[..., 1:])],
                         axis=-1)
    aug = Hn + jj * ext_p
    run = _prefix_max(aug)
    pad = jnp.full(Hn.shape[:-1] + (1,), NEG, Hn.dtype)
    I = jnp.concatenate([pad, run[..., :-1]], axis=-1) \
        - jj * ext_p - (open_p - ext_p)
    return jnp.maximum(Hn, I), Dn, I


@functools.partial(jax.jit, static_argnames=(
    "steps", "beam", "match", "tpen", "tvpen", "open_p", "ext_p", "xdrop",
    "backward"))
def _beam_scan(graph, start_nodes, tails, tlens, steps, beam,
               match, tpen, tvpen, open_p, ext_p, xdrop, backward):
    """Run the batched beam extension.

    Returns (best (B,), best_step (B,), best_beam (B,),
             parents (steps, B, W) int32, chars (steps, B, W) int32,
             nodes_hist (steps, B, W) int32).
    """
    B, LQ = tails.shape
    W = beam
    S = 4  # DNA successors per node
    jj = jnp.arange(LQ + 1, dtype=jnp.int32)
    j_valid = jj[None, :] <= tlens[:, None]          # (B, LQ+1)
    H0 = jnp.where(jj[None, :] == 0, 0,
                   -open_p - (jj[None, :] - 1) * ext_p)
    H0 = jnp.where(j_valid, H0, NEG).astype(jnp.int32)
    # beam slot 0 holds the seed column; others start dead
    H = jnp.full((B, W, LQ + 1), NEG, jnp.int32).at[:, 0, :].set(H0)
    D = jnp.full((B, W, LQ + 1), NEG, jnp.int32)
    node = jnp.zeros((B, W), jnp.int32).at[:, 0].set(start_nodes)
    alive = jnp.zeros((B, W), bool).at[:, 0].set(start_nodes > 0)
    best0 = jnp.where(start_nodes > 0, 0, NEG).astype(jnp.int32)

    q_codes = tails.astype(jnp.int32)

    def step(carry, t):
        H, D, node, alive, best, best_step, best_beam = carry
        flat_nodes = node.reshape(-1)
        adj = (graph.predecessors(flat_nodes) if backward
               else graph.successors(flat_nodes))
        succ = adj.reshape(B, W, S)
        # candidate columns: (B, W, S, LQ+1)
        He = H[:, :, None, :]
        De = D[:, :, None, :]
        c = jnp.arange(1, S + 1, dtype=jnp.int32)[None, None, :, None]
        qb = q_codes[:, None, None, :]
        Hn, Dn, _ = _column_update(He, De, qb, c, jj[None, None, None, :],
                                   match, tpen, tvpen, open_p, ext_p)
        Hn = jnp.where(j_valid[:, None, None, :], Hn, NEG)
        valid = alive[:, :, None] & (succ > 0)
        colmax = jnp.max(Hn, axis=-1)
        colmax = jnp.where(valid, colmax, NEG)                # (B, W, S)
        flat_score = colmax.reshape(B, W * S)
        top_score, top_idx = jax.lax.top_k(flat_score, W)     # (B, W)
        pw = top_idx // S
        pc = top_idx % S + 1
        bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
        Hn2 = Hn.reshape(B, W * S, LQ + 1)[bidx, top_idx]
        Dn2 = Dn.reshape(B, W * S, LQ + 1)[bidx, top_idx]
        node2 = succ.reshape(B, W * S)[bidx, top_idx]
        # best update + x-drop
        step_best = top_score[:, 0]
        improved = step_best > best
        best = jnp.maximum(best, step_best)
        best_step = jnp.where(improved, t, best_step)
        best_beam = jnp.where(improved, 0, best_beam)
        alive2 = (top_score > NEG // 2) & (top_score >= (best[:, None]
                                                         - xdrop))
        return ((Hn2, Dn2, node2, alive2, best, best_step, best_beam),
                (pw.astype(jnp.int32), pc.astype(jnp.int32),
                 node2.astype(jnp.int32)))

    init = (H, D, node, alive, best0,
            jnp.full((B,), -1, jnp.int32), jnp.zeros((B,), jnp.int32))
    (Hf, Df, nodef, alivef, best, best_step, best_beam), hist = \
        jax.lax.scan(step, init, jnp.arange(steps, dtype=jnp.int32))
    parents, chars, nodes_hist = hist
    return best, best_step, best_beam, parents, chars, nodes_hist


def beam_extend_batch(graph, start_nodes: np.ndarray, tails: np.ndarray,
                      tlens: np.ndarray, cfg, beam: int = 8,
                      backward: bool = False
                      ) -> Tuple[np.ndarray, List[np.ndarray],
                                 List[np.ndarray]]:
    """Extend every read's seed through the graph at once.

    Returns (best_scores (B,), per-read char-code paths,
    per-read node-id paths) — paths already truncated at the best step.
    """
    B, LQ = tails.shape
    if B == 0:
        return np.zeros(0, np.int64), [], []
    steps = int(LQ + max(4, LQ // 4))
    best, best_step, best_beam, parents, chars, nodes_hist = _beam_scan(
        graph, jnp.asarray(start_nodes.astype(np.int32)),
        jnp.asarray(tails.astype(np.int32)),
        jnp.asarray(tlens.astype(np.int32)),
        steps=steps, beam=beam,
        match=cfg.match_score, tpen=cfg.mm_transition_penalty,
        tvpen=cfg.mm_transversion_penalty,
        open_p=cfg.gap_opening_penalty, ext_p=cfg.gap_extension_penalty,
        xdrop=cfg.xdrop, backward=backward)
    best = np.asarray(best)
    best_step = np.asarray(best_step)
    best_beam = np.asarray(best_beam)
    parents = np.asarray(parents)      # (steps, B, W)
    chars = np.asarray(chars)
    nodes_hist = np.asarray(nodes_hist)
    # vectorized traceback across all reads: walk from (best_step, beam)
    max_t = int(best_step.max()) if len(best_step) else -1
    out_chars = np.zeros((B, max(max_t + 1, 0)), np.int32)
    out_nodes = np.zeros((B, max(max_t + 1, 0)), np.int32)
    cur_beam = best_beam.copy()
    bidx = np.arange(B)
    for t in range(max_t, -1, -1):
        active = best_step >= t
        out_chars[active, t] = chars[t, bidx[active], cur_beam[active]]
        out_nodes[active, t] = nodes_hist[t, bidx[active], cur_beam[active]]
        cur_beam = np.where(active, parents[t, bidx, cur_beam], cur_beam)
    char_paths = [out_chars[b, :best_step[b] + 1] for b in range(B)]
    node_paths = [out_nodes[b, :best_step[b] + 1] for b in range(B)]
    return best.astype(np.int64), char_paths, node_paths


# ---------------------------------------------------------------------------
# batched full DP for CIGAR recovery
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "match", "tpen", "tvpen", "open_p", "ext_p"))
def _full_dp(q, r, qlens, rlens, match, tpen, tvpen, open_p, ext_p):
    """(B, LR+1, LQ+1) H/D/I matrices of the affine semi-global DP —
    same semantics as aligner.affine_semiglobal, batched on device."""
    B, LQ = q.shape
    LR = r.shape[1]
    jj = jnp.arange(LQ + 1, dtype=jnp.int32)
    j_valid = jj[None, :] <= qlens[:, None]
    H0 = jnp.where(jj[None, :] == 0, 0,
                   -open_p - (jj[None, :] - 1) * ext_p)
    H0 = jnp.where(j_valid, H0, NEG).astype(jnp.int32)
    I0 = jnp.where(jj[None, :] == 0, NEG, H0).astype(jnp.int32)
    D0 = jnp.full((B, LQ + 1), NEG, jnp.int32)

    def step(carry, t):
        H, D = carry
        c = jax.lax.dynamic_slice_in_dim(r, t, 1, axis=1).astype(jnp.int32)
        Hn, Dn, In = _column_update(H, D, q.astype(jnp.int32), c,
                                    jj[None, :], match, tpen, tvpen,
                                    open_p, ext_p)
        Hn = jnp.where(j_valid, Hn, NEG)
        t_ok = (t < rlens)[:, None]
        Hn = jnp.where(t_ok, Hn, H)
        Dn = jnp.where(t_ok, Dn, D)
        In = jnp.where(t_ok, In, NEG)
        return (Hn, Dn), (Hn, Dn, In)

    (_, _), (Hs, Ds, Is) = jax.lax.scan(step, (H0, D0),
                                        jnp.arange(LR, dtype=jnp.int32))
    H = jnp.concatenate([H0[:, None, :], jnp.moveaxis(Hs, 0, 1)], axis=1)
    D = jnp.concatenate([D0[:, None, :], jnp.moveaxis(Ds, 0, 1)], axis=1)
    I0 = jnp.where(jj[None, :] == 0, NEG, H0)
    I = jnp.concatenate([I0[:, None, :], jnp.moveaxis(Is, 0, 1)], axis=1)
    return H, D, I


@functools.partial(jax.jit, static_argnames=(
    "match", "tpen", "tvpen", "open_p", "ext_p"))
def _full_dp_ends(q, r, qlens, rlens, match, tpen, tvpen, open_p, ext_p):
    """(B, 3) [score, r_end, q_end] via the XLA full DP + device argmax
    (row-major first-max, same tie rule as np.argmax)."""
    H, _, _ = _full_dp(q, r, qlens, rlens, match, tpen, tvpen,
                       open_p, ext_p)
    B, LRp, LQp = H.shape
    tt = jnp.arange(LRp, dtype=jnp.int32)[None, :, None]
    jjj = jnp.arange(LQp, dtype=jnp.int32)[None, None, :]
    mask = (tt <= rlens[:, None, None]) & (jjj <= qlens[:, None, None])
    Hm = jnp.where(mask, H, NEG)
    flat = Hm.reshape(B, -1)
    pos = jnp.argmax(flat, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(flat, pos[:, None], axis=1)[:, 0]
    return jnp.stack([best, pos // LQp, pos % LQp], axis=1)


def batched_ends(q: np.ndarray, r: np.ndarray, qlens: np.ndarray,
                 rlens: np.ndarray, open_p: int, ext_p: int, match: int,
                 tpen: int, tvpen: int) -> np.ndarray:
    """(B, 3) [score, r_end, q_end] — the score-only alignment engine.

    On TPU this runs the Pallas wavefront kernel (align/pallas_dp.py):
    O(B*LQ) memory, no (B, LR, LQ) matrix materialization or transfer.
    Elsewhere it falls back to the XLA full DP with a device argmax.
    Both produce identical results (same DP, same argmax tie rule)."""
    B = len(q)
    if B == 0:
        return np.zeros((0, 3), np.int32)
    args = (jnp.asarray(q.astype(np.int32)), jnp.asarray(r.astype(np.int32)),
            jnp.asarray(qlens.astype(np.int32)),
            jnp.asarray(rlens.astype(np.int32)))
    if jax.default_backend() != "cpu":
        from .pallas_dp import batch_align_ends
        out = batch_align_ends(*args, match=match, tpen=tpen, tvpen=tvpen,
                               open_p=open_p, ext_p=ext_p)
    else:
        out = _full_dp_ends(*args, match=match, tpen=tpen, tvpen=tvpen,
                            open_p=open_p, ext_p=ext_p)
    return np.asarray(out)


def batched_cigars(q: np.ndarray, r: np.ndarray, qlens: np.ndarray,
                   rlens: np.ndarray, sub: np.ndarray, open_p: int,
                   ext_p: int, match: int, tpen: int, tvpen: int
                   ) -> List[Tuple[int, int, int, List[str]]]:
    """Batched (score, q_end, r_end, ops) — device DP matrices + an O(L)
    host argmax walk per read (no O(L^2) host DP)."""
    B = len(q)
    if B == 0:
        return []
    H_d, D_d, I_d = _full_dp(jnp.asarray(q.astype(np.int32)),
                             jnp.asarray(r.astype(np.int32)),
                             jnp.asarray(qlens.astype(np.int32)),
                             jnp.asarray(rlens.astype(np.int32)),
                             match=match, tpen=tpen, tvpen=tvpen,
                             open_p=open_p, ext_p=ext_p)
    H = np.asarray(H_d).astype(np.int64)
    D = np.asarray(D_d).astype(np.int64)
    I = np.asarray(I_d).astype(np.int64)
    out = []
    for b in range(B):
        Lq, Lr = int(qlens[b]), int(rlens[b])
        Hb = H[b, :Lr + 1, :Lq + 1]
        Db = D[b, :Lr + 1, :Lq + 1]
        Ib = I[b, :Lr + 1, :Lq + 1]
        t, j = np.unravel_index(np.argmax(Hb), Hb.shape)
        score = int(Hb[t, j])
        qe, re_ = int(j), int(t)
        # same traceback discipline as aligner.affine_semiglobal
        ops: List[str] = []
        while t > 0 or j > 0:
            if t > 0 and j > 0 and Hb[t, j] == Hb[t - 1, j - 1] \
                    + sub[q[b][j - 1], r[b][t - 1]]:
                ops.append("=" if q[b][j - 1] == r[b][t - 1] else "X")
                t -= 1
                j -= 1
            elif t > 0 and Hb[t, j] == Db[t, j]:
                while t > 0 and Db[t, j] == Db[t - 1, j] - ext_p:
                    ops.append("D")
                    t -= 1
                ops.append("D")
                t -= 1
            elif j > 0:
                if Hb[t, j] == Ib[t, j]:
                    while j > 0 and Ib[t, j] == Ib[t, j - 1] - ext_p:
                        ops.append("I")
                        j -= 1
                ops.append("I")
                j -= 1
            else:
                ops.append("D")
                t -= 1
        out.append((score, qe, re_, ops[::-1]))
    return out
