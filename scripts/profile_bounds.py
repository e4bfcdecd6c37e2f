"""Profile the NEW bounds-path capacity build piece by piece.

Pieces: h2d of nibble-packed codes, _collect_stage_bounds dispatch,
_finish_stage_bounds dispatch, from_finish, plus a raw link-speed probe.

Usage: python scripts/profile_bounds.py [n_log2=25]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from metagraph_tpu.graph import boss_construct as bc
from metagraph_tpu.common import packed
from metagraph_tpu.kmer.alphabets import DNA

K = 20
n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 25
n = 1 << n_log2
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

# raw link speed: h2d of a 16 MB buffer, 3x
buf = rng.integers(0, 1 << 31, 4 << 20).astype(np.uint32)
force(jax.device_put(buf))
best = float("inf")
for _ in range(3):
    t0 = time.time()
    force(jax.device_put(buf))
    best = min(best, time.time() - t0)
print(f"h2d 16MB: {best*1e3:.1f} ms -> {16/best:.0f} MB/s", flush=True)


def t(name, fn, *args, **kw):
    out = force(fn(*args, **kw))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = force(fn(*args, **kw))
        best = min(best, time.time() - t0)
    print(f"{name:34s} {best*1e3 - SYNC_MS:9.1f} ms", flush=True)
    return out


target = bc._bucket(codes_np.shape[0])
if codes_np.shape[0] < target:
    codes_np = np.concatenate(
        [codes_np, np.full(target - codes_np.shape[0], 255, np.uint8)])
nn = codes_np.shape[0]

t0 = time.time()
pk2 = bc.pack_codes2_host(codes_np)
words_np, idx_np = pk2[0], pk2[1]
print(f"{'host 2-bit pack':34s} {(time.time()-t0)*1e3:9.1f} ms", flush=True)

words = t("h2d packed words", lambda: jax.device_put(words_np))
idx = jax.device_put(idx_np); force(idx)

nw = nn - K + 1
cap_b = bc._bucket(max(4096, min(nw >> 4, 8 << 20)))
print(f"cap_b={cap_b}", flush=True)

out = t("collect_stage_bounds", bc._collect_stage_bounds_packed2, words,
        idx, nn, K, B, cap_b, False, DNA.complement)
ulanes, ucounts, cnts, bounds = out
cnts = np.asarray(cnts)
n_u, n_end, n_start = int(cnts[0]), int(cnts[1]), int(cnts[2])
print(f"n_u={n_u} n_end={n_end} n_start={n_start}", flush=True)
capq = min(bc._bucket(max(n_end, n_start, 1)), cap_b)
sink_cand = bounds[0][:, :capq]
src_cand = bounds[1][:, :capq]
cap = min(max(bc._bucket(n_u), 1), ulanes.shape[1])
real, counts = ulanes[:, :cap], ucounts[:cap]
force((real, counts, sink_cand, src_cand))

max_count = (1 << 31) - 1
res = t("finish_stage_bounds", bc._finish_stage_bounds, real, counts,
        jnp.int32(n_u), sink_cand, src_cand, K, B, DNA.size, max_count,
        False, DNA.complement)
kept, W, last, F, weights, lut, stats = res
stats = np.asarray(stats)
print("stats", stats, flush=True)

# inner pieces of finish_stage_bounds
real_m = jnp.where(packed.valid_mask(cap, jnp.int32(n_u))[None, :], real,
                   packed.full_pad(cap, real.shape[0]))
force(real_m)

from functools import partial


@partial(jax.jit, static_argnames=("K", "B", "sigma"))
def probes_piece(real_m, sink_cand, src_cand, K, B, sigma):
    return bc._probe_dummies(real_m, sink_cand, src_cand, K, B, sigma)


pr = t("probe_dummies", probes_piece, real_m, sink_cand, src_cand, K, B,
       DNA.size)
sinks, n_sinks, src, n_src = pr

lv = t("levels_phase", bc._levels_phase, src, n_src, K, B)
levels, n_lv = lv

t("merge_emit", bc._merge_emit_stage, real, counts, jnp.int32(n_u),
  sinks, n_sinks, src, n_src, levels, n_lv, K, B, DNA.size, max_count)


@jax.jit
def sort_piece(x):
    return packed.sort(x)[0]


t(f"bare sort L={real.shape[0]} cap={cap}", sort_piece, real)


@partial(jax.jit, static_argnames=("K", "B"))
def extract_piece(words, idx, K, B):
    codes = bc._unpack_codes2(words, idx, nn)
    from metagraph_tpu.kmer.extractor import window_validity
    from metagraph_tpu.kmer import packing
    ok = window_validity(codes, K)
    lanes = packing.pack_windows(codes, K, B)
    return lanes[:, ::1024], ok[::1024]


t("extract(unpack+windows)", extract_piece, words, idx, K, B)


def e2e():
    b2 = bc.build_boss_from_codes(codes_np[:n], K, DNA)
    return b2.F, b2.NF


t("build_boss_from_codes e2e", e2e)
