"""Profile the capacity build (33.5M k-mers) stage by stage on the TPU.

Axon-runtime gotcha (measured, round 4): computation can be DEFERRED
until a d2h materialization — ``block_until_ready`` on a never-
materialized buffer returns immediately without compiling or running
anything. Every stage here is therefore forced with a 1-element
``np.asarray`` slice (costs one d2h round trip ~30-60 ms, subtracted
via the measured sync floor).

Usage: python scripts/profile_capacity.py [n_log2]
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
n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 25)
rng = np.random.default_rng(0)
codes_np = rng.integers(1, 5, n).astype(np.uint8)

B = DNA.bits_per_char


def force(out):
    """Materialize ONE element of every array in ``out`` (tuple/array)."""
    leaves = jax.tree_util.tree_leaves(out)
    for a in leaves:
        if hasattr(a, "shape") and a.size:
            np.asarray(a.ravel()[:1] if a.ndim else a)
    return out


# measure the d2h sync floor first
_x = jnp.zeros((8,), jnp.int32)
force(_x)
t0 = time.time()
for _ in range(5):
    force(_x + 1)
SYNC_MS = (time.time() - t0) / 5 * 1e3
print(f"d2h sync floor: {SYNC_MS:.1f} ms", flush=True)


def t(name, fn, *args, **kw):
    out = force(fn(*args, **kw))          # compile + first real run
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = force(fn(*args, **kw))
        best = min(best, time.time() - t0)
    print(f"{name:32s} {best*1e3 - SYNC_MS:9.1f} ms", flush=True)
    return out


target = bc._bucket(codes_np.shape[0])
if codes_np.shape[0] < target:
    codes_np = np.concatenate(
        [codes_np, np.full(target - codes_np.shape[0], 255, np.uint8)])

t0 = time.time()
codes = jax.device_put(codes_np)
force(codes)
print(f"{'h2d codes (warm process)':32s} {(time.time()-t0)*1e3:9.1f} ms")

out = t("collect(extract+sort+uniq)", bc._collect_stage, codes, K, B, (),
        False, DNA.complement)
ulanes, ucounts, ucount = out
n_u = int(ucount)
cap = bc._bucket(n_u)
real, counts = ulanes[:, :cap], ucounts[:cap]
real = force(real)
counts = force(counts)
print(f"n_unique={n_u} cap={cap} lanes={real.shape}")

t("extract only", bc._extract_stage, codes, K, B, (), False, DNA.complement)

jsort = jax.jit(lambda v: packed.sort(v)[0])
t(f"bare sort (cap, L={real.shape[0]})", jsort, real)
jsort_c = jax.jit(lambda v, c: packed.sort(v, c)[0])
t("sort + counts payload", jsort_c, real, counts)

max_count = (1 << 31) - 1
cap_d = max(cap >> 4, 4096)
res = t("finish_stage (fused)", bc._finish_stage, real, counts,
        jnp.int32(n_u), K, B, DNA.size, max_count, cap_d, False,
        DNA.complement)
stats = np.asarray(res[-1])
print("stats", stats)

# staged pieces
from functools import partial
import metagraph_tpu.kmer.packing as kp


@partial(jax.jit, static_argnames=("K", "B"))
def sinks_piece(real, n_real, K, B):
    capl = real.shape[1]
    valid = packed.valid_mask(capl, n_real)
    shifted = kp.to_next(real, K, B, 0)
    real_nodes = kp.node_key(real, B)
    q_nodes = jnp.where(valid[None, :], kp.node_key(shifted, B),
                        packed.full_pad(capl, real.shape[0]))
    present = packed.isin_merge(real_nodes, q_nodes)
    return present


t("sinks isin_merge", sinks_piece, real, jnp.int32(n_u), K, B)


@partial(jax.jit, static_argnames=("cap_d",))
def compact_piece(real, keep, cap_d):
    return packed.compact(real, keep, cap_d)


keep = jnp.arange(real.shape[1]) % 7 == 0
t("compact (stable sort)", compact_piece, real, keep, cap_d)

lv_src = packed.pad_to(real[:, :1024], cap_d)
t("levels_phase (K-2 loops)", bc._levels_phase, lv_src,
  jnp.int32(1024), K, B)

t("merge_emit", bc._merge_emit_stage, real, counts, jnp.int32(n_u),
  lv_src, jnp.int32(1000), lv_src, jnp.int32(1000),
  packed.full_pad(cap_d, real.shape[0]), jnp.int32(0),
  K, B, DNA.size, max_count)

kept, W, last, F, weights, lut, stats_d = res


def fin():
    b = bc.Boss.from_finish(k=K - 1, alph_size=DNA.size, bits_per_char=B,
                            kept=kept, W=W, last=last, F=F,
                            n_kept=int(stats[0]), weights=None,
                            keep_kmer_index=True, lut=lut,
                            max_bucket=int(stats[5]))
    return b.F, b.NF, b.last_rank.words


t("from_finish(finalize ranks)", fin)


def full():
    b2 = bc.build_boss_from_codes(codes_np, K, DNA)
    return b2.F, b2.NF


t("build_boss_from_codes e2e", full)
