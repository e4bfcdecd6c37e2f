"""Micro-profile the inner pieces of collect and merge_emit at 33.5M.

Usage: python scripts/profile_inner.py [n_log2=25]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from metagraph_tpu.graph import boss_construct as bc
from metagraph_tpu.common import packed, merge as pmerge
from metagraph_tpu.kmer import packing
from metagraph_tpu.kmer.alphabets import DNA

K = 20
n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 25)
rng = np.random.default_rng(0)
codes_np = rng.integers(1, 5, n).astype(np.uint8)
B = DNA.bits_per_char


def force(out):
    for a in jax.tree_util.tree_leaves(out):
        if hasattr(a, "shape") and a.size:
            np.asarray(a.ravel()[:1] if a.ndim else a)
    return out


_x = jnp.zeros((8,), jnp.int32)
force(_x)
t0 = time.time()
for _ in range(5):
    force(_x + 1)
SYNC_MS = (time.time() - t0) / 5 * 1e3
print(f"d2h sync floor: {SYNC_MS:.1f} ms", flush=True)


def t(name, fn, *args):
    out = force(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = force(fn(*args))
        best = min(best, time.time() - t0)
    print(f"{name:36s} {best*1e3 - SYNC_MS:9.1f} ms", flush=True)
    return out


target = bc._bucket(codes_np.shape[0])
if codes_np.shape[0] < target:
    codes_np = np.concatenate(
        [codes_np, np.full(target - codes_np.shape[0], 255, np.uint8)])
nn = codes_np.shape[0]
words_np, idx_np, _ = bc.pack_codes2_host(codes_np)
words = jax.device_put(words_np)
idx = jax.device_put(idx_np)
force((words, idx))

nw = nn - K + 1
cap_b = bc._bucket(max(4096, min(nw >> 4, 8 << 20)))


# ---- collect pieces ----
@partial(jax.jit, static_argnames=("K", "B"))
def p_extract(words, idx, K, B):
    codes = bc._unpack_codes2(words, idx, nn)
    from metagraph_tpu.kmer.extractor import window_validity
    ok = window_validity(codes, K)
    lanes = packing.pack_windows(codes, K, B)
    return lanes[:, ::4096], ok[::4096]


t("extract(unpack+windows)", p_extract, words, idx, K, B)


@partial(jax.jit, static_argnames=("K", "B", "cap_b"))
def p_bounds(words, idx, K, B, cap_b):
    codes = bc._unpack_codes2(words, idx, nn)
    from metagraph_tpu.kmer.extractor import window_validity
    ok = window_validity(codes, K)
    lanes_all = packing.pack_windows(codes, K, B)
    return bc._bounds_body(lanes_all, ok, K, B, cap_b)


t("extract+bounds_body", p_bounds, words, idx, K, B, cap_b)


@partial(jax.jit, static_argnames=("K", "B"))
def p_mask_sort(words, idx, K, B):
    codes = bc._unpack_codes2(words, idx, nn)
    from metagraph_tpu.kmer.extractor import window_validity
    ok = window_validity(codes, K)
    lanes_all = packing.pack_windows(codes, K, B)
    L = lanes_all.shape[0]
    lanes = jnp.where(ok[None, :], lanes_all, packed.full_pad(nw, L))
    s, _ = packed.sort(lanes)
    return s[:, ::4096]


t("extract+mask+sort", p_mask_sort, words, idx, K, B)


@partial(jax.jit, static_argnames=("K", "B"))
def p_sort_unique(words, idx, K, B):
    codes = bc._unpack_codes2(words, idx, nn)
    from metagraph_tpu.kmer.extractor import window_validity
    ok = window_validity(codes, K)
    lanes_all = packing.pack_windows(codes, K, B)
    L = lanes_all.shape[0]
    lanes = jnp.where(ok[None, :], lanes_all, packed.full_pad(nw, L))
    count = jnp.sum(ok.astype(jnp.int32))
    return bc._sort_unique_ones_body(lanes, count)


out = t("extract+sort_unique(full)", p_sort_unique, words, idx, K, B)
ulanes, ucounts, ucount = out
n_u = int(ucount)
cap = min(max(bc._bucket(n_u), 1), ulanes.shape[1])
real, counts = force((ulanes[:, :cap], ucounts[:cap]))

# ---- merge_emit pieces ----
L = real.shape[0]
dummies_np = np.zeros((L, 8192), np.uint32)
dummies_np[:] = 0xFFFFFFFF
dummies = jnp.asarray(dummies_np)
zc = jnp.zeros((8192,), jnp.int32)
force(dummies)


@jax.jit
def p_merge(real, counts, dummies):
    m, (mc,) = pmerge.merge_sorted(real, dummies, (counts,), (zc,))
    return m[:, ::4096], mc[::4096]


t("merge_sorted real+8k", p_merge, real, counts, dummies)


@jax.jit
def p_partition(real, counts):
    keep = packed.valid_mask(real.shape[1], jnp.int32(n_u))
    k2, nk, (c2,) = pmerge.partition_compact(real, keep, real.shape[1],
                                             counts)
    return k2[:, ::4096], nk


t("partition_compact 33.5M+counts", p_partition, real, counts)


@partial(jax.jit, static_argnames=("B", "alph"))
def p_minus_seg(kept, B, alph):
    cap = kept.shape[1]
    kvalid = packed.valid_mask(cap, jnp.int32(n_u))
    klabels = packing.label(kept, B)
    bk = packed.shift_right(kept, 2 * B)
    block_first = packed.neighbor_ne(bk)
    minus = jnp.zeros((cap,), bool)
    for c in range(1, alph):
        mask_c = (klabels == c) & kvalid
        cnt = packed.blocked_cumsum(mask_c.astype(jnp.int32))
        start_excl = packed.blocked_cummax(
            jnp.where(block_first, cnt - mask_c.astype(jnp.int32), 0))
        minus = minus | (mask_c & ((cnt - start_excl) > 1))
    return minus[::4096]


t("minus segmented-first", p_minus_seg, real, B, DNA.size)


@partial(jax.jit, static_argnames=("B", "alph"))
def p_minus_win(kept, B, alph):
    cap = kept.shape[1]
    kvalid = packed.valid_mask(cap, jnp.int32(n_u))
    klabels = packing.label(kept, B)
    D = alph * alph - 1
    bk = packed.shift_right(kept, 2 * B)
    minus = jnp.zeros((cap,), bool)
    for d in range(1, D + 1):
        m = packed.eq(bk[:, d:], bk[:, :-d]) & (klabels[d:] == klabels[:-d])
        minus = minus | jnp.concatenate([jnp.zeros((d,), bool), m])
    return minus[::4096]


t("minus windowed D=24", p_minus_win, real, B, DNA.size)


@partial(jax.jit, static_argnames=("K", "B", "alph"))
def p_emit_rest(kept, counts, K, B, alph):
    cap = kept.shape[1]
    kvalid = packed.valid_mask(cap, jnp.int32(n_u))
    knodes = packing.node_key(kept, B)
    ksame = jnp.concatenate([
        packed.eq(knodes[:, :-1], knodes[:, 1:]), jnp.zeros((1,), bool)])
    last = kvalid & ~ksame
    ktopc = packing.top_char(kept, K, B)
    tc = jnp.where(kvalid, ktopc, alph)
    hist = jnp.stack([jnp.sum((tc == c).astype(jnp.int32))
                      for c in range(alph)])
    klabels = packing.label(kept, B)
    kfirst = packing.first_char(kept, B)
    weights = jnp.where((counts > 0) & (klabels != 0) & (kfirst != 0),
                        counts, 0)
    return last[::4096], hist, weights[::4096]


t("emit rest (last+hist+weights)", p_emit_rest, real, counts, K, B,
  DNA.size)


@jax.jit
def p_lut(kept):
    top = (kept[0] >> 16).astype(jnp.uint32)
    lut = jnp.searchsorted(top, jnp.arange(1 << 16, dtype=jnp.uint32),
                           side="left").astype(jnp.int32)
    return lut[::64]


t("lut searchsorted 65k/33.5M", p_lut, real)


# probe variants
capq = 4096
cand_np = np.full((L, capq), 0xFFFFFFFF, np.uint32)
cand_np[:, 0] = [0, 0x01234, 0x02222]
cand = jnp.asarray(cand_np)
force(cand)


@partial(jax.jit, static_argnames=("K", "B", "sigma"))
def p_probe_now(real, cand, K, B, sigma):
    return bc._probe_dummies(real, cand, cand, K, B, sigma)


t("probe_dummies (current)", p_probe_now, real, cand, K, B, DNA.size)


@partial(jax.jit, static_argnames=("steps",))
def p_ss(real, q, steps):
    return packed.searchsorted(real, q, side="left", steps=steps)


qn = jnp.concatenate([cand] * 6, axis=1)
force(qn)
t("searchsorted 24k q steps=25", p_ss, real, qn, 25)
t("searchsorted 24k q steps=0(while)", p_ss, real, qn, 0)
