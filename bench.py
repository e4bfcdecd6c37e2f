"""Benchmark: BOSS graph construction throughput on the real TPU.

Config: the reference's own test dataset (transcripts_1000.fa, k=20,
BASELINE.json config #1). Metric: k-mers/sec through the full build
pipeline (extract -> sort-unique -> dummy generation -> W/last/F emit),
measured on a warm run (compiles cached by the first run).

Baseline (BASELINE.md measurement plan — the reference publishes no
numbers): the same pipeline in single-threaded numpy on this host
(window extract + lexsort + unique), the same algorithmic class as the
reference's ips4o sort-based collection, measured once and cached in
bench_baseline.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

DATA = "/root/reference/metagraph/tests/data/transcripts_1000.fa"
K = 20
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def read_fasta(path):
    seqs, cur = [], []
    for line in open(path, "rb"):
        if line.startswith(b">"):
            if cur:
                seqs.append(b"".join(cur))
            cur = []
        else:
            cur.append(line.strip())
    if cur:
        seqs.append(b"".join(cur))
    return seqs


def numpy_baseline_kmers_per_sec(seqs):
    """Single-threaded numpy build-collection pipeline (the reference's
    algorithmic core: encode, window, pack, sort, dedupe)."""
    code = np.full(256, 255, np.uint8)
    for i, ch in enumerate(b"ACGT"):
        code[ch] = i
    t0 = time.time()
    packed_all = []
    total_windows = 0
    for s in seqs:
        a = code[np.frombuffer(s, np.uint8)]
        if len(a) < K:
            continue
        w = np.lib.stride_tricks.sliding_window_view(a, K)
        ok = np.all(w != 255, axis=1)
        total_windows += len(w)
        w = w[ok].astype(np.uint64)
        p = np.zeros(len(w), np.uint64)
        for j in range(K):
            p = (p << np.uint64(2)) | w[:, j]
        packed_all.append(p)
    allk = np.concatenate(packed_all)
    allk.sort(kind="stable")
    uniq = np.concatenate([[True], allk[1:] != allk[:-1]])
    n_unique = int(uniq.sum())
    dt = time.time() - t0
    return total_windows / dt, n_unique, total_windows


def tpu_build_seconds(seqs):
    from metagraph_tpu.graph.boss_construct import build_boss

    # warm-up run compiles all stage kernels
    t0 = time.time()
    boss = build_boss(seqs, K)
    log(f"cold build (incl. compile): {time.time() - t0:.2f} s, "
        f"num_edges={boss.num_edges}")
    # warm runs: take the best of 5 (the remote runtime's dispatch
    # latency wanders ~10% across the day; first warm call can also
    # flush one-time cache/alloc work)
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        boss = build_boss(seqs, K)
        _ = np.asarray(boss.W[:1])  # sync
        best = min(best, time.time() - t0)
    return best, boss


def bench_capacity():
    """Secondary metric: large single-chip build (33.5M distinct k-mers,
    random DNA — a worst case: zero duplicate collapse)."""
    import gc
    import jax
    from metagraph_tpu.graph.boss_construct import build_boss_from_codes
    from metagraph_tpu.kmer.alphabets import DNA
    n = 1 << 25
    rng = np.random.default_rng(0)
    codes = rng.integers(1, 5, n).astype(np.uint8)
    boss = build_boss_from_codes(codes, 20, DNA)      # compile + warm
    jax.block_until_ready(boss.F)
    del boss
    gc.collect()
    codes = rng.integers(1, 5, n).astype(np.uint8)
    t0 = time.time()
    boss = build_boss_from_codes(codes, 20, DNA)
    jax.block_until_ready(boss.F)
    dt = time.time() - t0
    log(f"capacity: {n/1e6:.0f}M-char single-chip build in {dt:.2f}s -> "
        f"{(n-19)/dt/1e6:.1f} Mk-mers/s ({boss.num_edges} edges)")


def bench_query(boss, seqs):
    """Secondary metric: batched query throughput (reads/sec)."""
    import jax.numpy as jnp
    from metagraph_tpu.graph.dbg_succinct import DbgSuccinct
    from metagraph_tpu.kmer.alphabets import DNA
    from metagraph_tpu.engine.annotated_dbg import (AnnotatedDbg, BatchQuery,
                                                    annotate_sequences)
    g = DbgSuccinct.from_boss(boss, DNA, "basic")
    ann_items = [(s, [f"label_{i % 10}"]) for i, s in enumerate(seqs[:200])]
    ann = annotate_sequences(g, ann_items).finalize()
    bq = BatchQuery(AnnotatedDbg(graph=g, annotation=ann))
    rng = np.random.default_rng(0)
    reads = []
    for _ in range(2000):
        s = seqs[rng.integers(0, len(seqs))]
        if len(s) > 120:
            p = rng.integers(0, len(s) - 100)
            reads.append(s[p:p + 100])
    bq.get_labels_batch(reads, 0.7)        # warm up (same shapes)
    t0 = time.time()
    res = bq.get_labels_batch(reads, 0.7)
    dt = time.time() - t0
    log(f"query: {len(reads)} reads in {dt:.3f}s -> "
        f"{len(reads)/dt:.0f} reads/s (batched label queries)")


def bench_align_kernel():
    """Secondary metric: Pallas DP kernel throughput."""
    import jax.numpy as jnp
    from metagraph_tpu.align.pallas_dp import batch_align_scores
    rng = np.random.default_rng(0)
    R, LQ, LR = 1024, 128, 160
    qs = rng.integers(1, 5, size=(R, LQ)).astype(np.int32)
    rs = rng.integers(1, 5, size=(R, LR)).astype(np.int32)
    ql = np.full(R, LQ)
    rl = np.full(R, LR)
    args = (jnp.asarray(qs), jnp.asarray(rs), jnp.asarray(ql),
            jnp.asarray(rl))
    np.asarray(batch_align_scores(*args))  # compile
    t0 = time.time()
    np.asarray(batch_align_scores(*args))
    dt = time.time() - t0
    log(f"align kernel: {R} pairs ({LQ}x{LR}) in {dt*1e3:.1f}ms -> "
        f"{R*LQ*LR/dt/1e9:.2f} Gcells/s, {R/dt:.0f} alignments/s")


def bench_align_batch(boss, seqs):
    """Secondary metric: end-to-end batched aligner reads/sec."""
    from metagraph_tpu.align.aligner import Aligner
    from metagraph_tpu.graph.dbg_succinct import DbgSuccinct
    from metagraph_tpu.kmer.alphabets import DNA
    g = DbgSuccinct.from_boss(boss, DNA, "basic")
    rng = np.random.default_rng(1)
    reads = []
    sub = {65: 67, 67: 65, 71: 84, 84: 71}
    for _ in range(512):
        s = seqs[rng.integers(0, len(seqs))]
        if len(s) < 130:
            continue
        p = rng.integers(0, len(s) - 110)
        r = bytearray(s[p:p + 100])
        # one substitution per read: exercises the extension DP
        q = rng.integers(10, 90)
        r[q] = sub.get(r[q], 65)
        reads.append(bytes(r))
    al = Aligner(g)
    al.align_batch(reads)                  # warm up / compile (same shapes)
    t0 = time.time()
    res = al.align_batch(reads)
    dt = time.time() - t0
    n_ok = sum(1 for r in res if r)
    log(f"align_batch: {len(reads)} reads in {dt:.2f}s -> "
        f"{len(reads)/dt:.0f} reads/s ({n_ok} aligned)")


def main():
    seqs = read_fasta(DATA)
    total_bp = sum(map(len, seqs))
    log(f"{len(seqs)} sequences, {total_bp/1e6:.2f} Mbp")

    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            base = json.load(f)
    else:
        rate, n_unique, total_windows = numpy_baseline_kmers_per_sec(seqs)
        base = {"kmers_per_sec": rate, "n_unique": n_unique,
                "total_windows": total_windows}
        with open(BASELINE_CACHE, "w") as f:
            json.dump(base, f)
    log(f"baseline (numpy 1-thread collection): "
        f"{base['kmers_per_sec']/1e6:.2f} Mk-mers/s")

    dt, boss = tpu_build_seconds(seqs)
    if os.environ.get("METAGRAPH_TPU_BENCH_EXTRA"):
        try:
            bench_query(boss, seqs)
            bench_align_kernel()
            bench_align_batch(boss, seqs)
            bench_capacity()
        except Exception as e:
            log(f"secondary benches failed: {e}")
    total_windows = base["total_windows"]
    value = total_windows / dt
    log(f"warm TPU full build: {dt:.3f} s -> {value/1e6:.2f} Mk-mers/s "
        f"(full pipeline incl. dummy gen + emit)")

    print(json.dumps({
        "metric": "build_kmers_per_sec",
        "value": round(value, 1),
        "unit": "kmers/sec (transcripts_1000.fa k=20 full BOSS build)",
        "vs_baseline": round(value / base["kmers_per_sec"], 3),
    }))


if __name__ == "__main__":
    main()
