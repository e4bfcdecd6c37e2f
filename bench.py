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

Robustness: the round-2 bench died with rc=1 because the remote TPU
backend failed to initialize once.  This version (a) retries backend
init with backoff, (b) falls back to the CPU backend if the TPU stays
unreachable, and (c) always prints ONE JSON line and exits 0 — partial
results beat a stack trace.  Extra keys report the capacity build and
an HBM-roofline estimate (VERDICT round 2, item 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

DATA = "/root/reference/metagraph/tests/data/transcripts_1000.fa"
K = 20
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")

# HBM bandwidth by device kind (bytes/s), for the roofline estimate.
HBM_BW = {
    "TPU v4": 1228e9,
    "TPU v5e": 819e9,
    "TPU v5 lite": 819e9,
    "TPU v5": 1640e9,   # v5p
    "TPU v6e": 1640e9,
    "cpu": 50e9,        # rough host DDR figure; CPU runs are fallback-only
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _probe_subprocess(timeout_s: float) -> str | None:
    """Probe backend init in a THROWAWAY subprocess with a hard timeout.

    In this environment a broken TPU tunnel makes ``jax.devices()`` HANG
    rather than raise, so the probe must be killable. Returns the
    platform string on success, None on hang/failure."""
    import subprocess
    code = ("import jax; d = jax.devices(); "
            "print('PROBE_OK', d[0].platform, d[0].device_kind, flush=True)")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        log(f"backend probe hung (> {timeout_s:.0f}s)")
        return None
    for line in r.stdout.splitlines():
        if line.startswith("PROBE_OK"):
            log(f"backend probe: {line.strip()}")
            return line.split()[1]
    tail = (r.stderr or "").strip().splitlines()
    log(f"backend probe failed (rc={r.returncode}): "
        f"{tail[-1] if tail else 'no output'}")
    return None


def ensure_backend(max_attempts: int = 3, base_delay: float = 15.0,
                   probe_timeout: float = 150.0) -> str:
    """Establish a usable JAX backend, preferring the TPU.

    Probes backend init in subprocesses (hang-proof) with retries and
    backoff; on persistent failure, pins the main process to the CPU
    backend so the bench still produces a number."""
    import jax
    for attempt in range(max_attempts):
        plat = _probe_subprocess(probe_timeout)
        if plat is not None:
            return plat
        if attempt < max_attempts - 1:
            delay = base_delay * (1.5 ** attempt)
            log(f"retrying backend probe in {delay:.0f}s ...")
            time.sleep(delay)
    log("TPU backend unreachable after retries - falling back to CPU")
    jax.config.update("jax_platforms", "cpu")
    try:  # drop any cached failed-backend state
        from jax._src import xla_bridge
        xla_bridge.backends.cache_clear()
    except Exception:
        pass
    return jax.devices()[0].platform


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


def force(out):
    """Materialize one element of every array: on the axon runtime,
    block_until_ready returns before DEFERRED execution — only a d2h
    materialization is a true barrier (measured round 4)."""
    import jax
    for a in jax.tree_util.tree_leaves(out):
        if hasattr(a, "ravel") and getattr(a, "size", 0):
            np.asarray(a.ravel()[:1])
    return out


def tpu_build_seconds(seqs):
    from metagraph_tpu.graph.boss_construct import build_boss

    # warm-up run compiles all stage kernels
    t0 = time.time()
    boss = build_boss(seqs, K)
    force(boss.F)
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


def roofline_pct(n_kmers: int, lanes: int, seconds: float, bw: float) -> float:
    """Fraction of HBM speed-of-light achieved by the build.

    Speed-of-light model: an ideal 8-bit-digit LSD radix sort of the
    packed keys is the irreducible work of this pipeline (the reference's
    equivalent is ips4o, boss_chunk_construct.cpp:280-306).  Each digit
    pass reads + writes every key once: passes = ceil(key_bits / 8),
    bytes = 2 * passes * N * key_bytes, plus one extract read and one
    emit write.  Everything else (dedupe masks, neighbor compares, emit)
    is fused elementwise traffic already counted by those passes."""
    key_bytes = 4 * lanes
    passes = -(-(32 * lanes) // 8)
    sort_bytes = 2 * passes * n_kmers * key_bytes
    io_bytes = 2 * n_kmers * key_bytes
    sol_seconds = (sort_bytes + io_bytes) / bw
    return sol_seconds / seconds


def bench_capacity(bw: float):
    """Capacity metric (headline #2): large single-chip build (33.5M
    distinct k-mers, random DNA — a worst case: zero duplicate collapse).
    Returns (kmers_per_sec, roofline_fraction)."""
    import gc
    import jax
    from metagraph_tpu.graph.boss_construct import build_boss_from_codes
    from metagraph_tpu.kmer.alphabets import DNA
    n = 1 << 25
    rng = np.random.default_rng(0)
    codes = rng.integers(1, 5, n).astype(np.uint8)
    boss = build_boss_from_codes(codes, 20, DNA)      # compile + warm
    force((boss.F, boss.NF, boss.last_rank.words))
    lanes = boss.edge_lanes.shape[0] if boss.edge_lanes is not None else 3
    del boss
    gc.collect()
    codes = rng.integers(1, 5, n).astype(np.uint8)
    # best-of-3: the remote runtime's dispatch occasionally stalls for
    # many seconds — a one-shot reading is hostage to that (round 4:
    # one-shot 19.2s vs best-of-3 2.3s for the same build)
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        boss = build_boss_from_codes(codes, 20, DNA)
        force((boss.F, boss.NF, boss.last_rank.words))
        dt = min(dt, time.time() - t0)
        gc.collect()
    rate = (n - 19) / dt
    pct = roofline_pct(n - 19, lanes, dt, bw)
    log(f"capacity: {n/1e6:.0f}M-char single-chip build in {dt:.2f}s -> "
        f"{rate/1e6:.1f} Mk-mers/s ({boss.num_edges} edges), "
        f"{100*pct:.1f}% of ideal-radix HBM roofline")
    return rate, pct


def bench_capacity_device(bw: float):
    """Device-resident capacity: the same 33.5M-k-mer build with the
    input already staged in HBM. On this remote-tunnel runtime the h2d
    link moves ~40 MB/s (vs PCIe's ~10+ GB/s in production), so the
    staged rate is the honest COMPUTE-path number; the end-to-end
    capacity metric above keeps the transfer."""
    import jax.numpy as jnp
    from metagraph_tpu.graph import boss_construct as bc
    from metagraph_tpu.kmer.alphabets import DNA
    K = 20
    n = 1 << 25
    rng = np.random.default_rng(3)
    codes_np = rng.integers(1, 5, n).astype(np.uint8)
    target = bc._bucket(n)
    if n < target:
        codes_np = np.concatenate(
            [codes_np, np.full(target - n, 255, np.uint8)])
    nn = codes_np.shape[0]
    words_np, idx_np, inval = bc.pack_codes2_host(codes_np, n_valid=n)
    import jax
    words = jax.device_put(words_np)
    idx = jax.device_put(idx_np)
    force((words, idx))
    B = DNA.bits_per_char
    end_pos, start_pos = bc.host_boundary_windows(inval, n, K)
    capq = bc._bucket(max(len(end_pos), len(start_pos), 1))
    ep = np.zeros(capq, np.int32)
    ep[:len(end_pos)] = end_pos
    sp = np.zeros(capq, np.int32)
    sp[:len(start_pos)] = start_pos
    epd, spd = jax.device_put(ep), jax.device_put(sp)
    force((epd, spd))
    max_count = (1 << 31) - 1

    def run():
        ulanes, ucounts, ucount, bounds = bc._collect_stage_bounds_pos(
            words, idx, jnp.int32(n), epd, jnp.int32(len(end_pos)),
            spd, jnp.int32(len(start_pos)), nn, K, B, False,
            DNA.complement)
        n_u = int(ucount)
        cap = min(max(bc._bucket(n_u), 1), ulanes.shape[1])
        kept, W, last, F, weights, lut, stats = bc._finish_stage_bounds(
            ulanes[:, :cap], ucounts[:cap], jnp.int32(n_u), *bounds,
            K, B, DNA.size, max_count, False, DNA.complement)
        force((F, stats))
        return int(np.asarray(stats)[0])

    run()                                  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        edges = run()
        best = min(best, time.time() - t0)
    rate = (n - K + 1) / best
    pct = roofline_pct(n - K + 1, 3, best, bw)
    log(f"capacity (device-resident input): {best:.3f}s -> "
        f"{rate/1e6:.1f} Mk-mers/s, {100*pct:.1f}% of ideal-radix "
        f"roofline ({edges} edges)")
    return rate, pct


def bench_kernels(bw: float):
    """Hot-kernel metrics: the production Pallas kernels vs their
    lax.sort formulations (the per-chip ceiling of the framework).
    The construction pipeline replaced most SORTS with linear merges/
    partitions of already-sorted data — a full Pallas sort was built
    and measured SLOWER than XLA's sort (see COMPONENTS.md), so the
    honest hot-kernel numbers are these."""
    import jax
    import jax.numpy as jnp
    from metagraph_tpu.common import merge, packed
    rng = np.random.default_rng(0)
    N = 1 << 24
    res = {}

    def timeit(f, *a):
        force(f(*a))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            force(f(*a))
            best = min(best, time.time() - t0)
        return best

    v = np.sort(rng.integers(0, 1 << 62, N).astype(np.uint64))
    a = jnp.asarray(
        np.stack([np.zeros(N, np.uint32), (v >> 32).astype(np.uint32),
                  (v & 0xFFFFFFFF).astype(np.uint32)]))
    v2 = np.sort(rng.integers(0, 1 << 62, N).astype(np.uint64))
    b = jnp.asarray(
        np.stack([np.zeros(N, np.uint32), (v2 >> 32).astype(np.uint32),
                  (v2 & 0xFFFFFFFF).astype(np.uint32)]))
    force(a); force(b)
    jm = jax.jit(lambda a, b: merge.merge_sorted(a, b)[0])
    js = jax.jit(lambda a, b: packed.sort(
        jnp.concatenate([a, b], axis=1))[0])
    res["merge_ms"] = timeit(jm, a, b) * 1e3
    res["merge_sort_ms"] = timeit(js, a, b) * 1e3
    moved = 2 * 2 * N * 12          # read+write both sides, 12B keys
    log(f"merge 16M+16M (L=3): {res['merge_ms']:.1f} ms "
        f"({moved/res['merge_ms']/1e6:.0f} GB/s, HBM {bw/1e9:.0f} GB/s) "
        f"vs lax.sort of concat {res['merge_sort_ms']:.1f} ms "
        f"-> {res['merge_sort_ms']/res['merge_ms']:.2f}x")
    keep = jnp.asarray(rng.random(2 * N) < 0.5)
    x2 = jnp.concatenate([a, b], axis=1)
    force(keep)
    jp = jax.jit(lambda x, k: merge.partition_compact(x, k, 2 * N)[0])
    jc = jax.jit(lambda x, k: packed.compact(x, k, 2 * N)[0])
    res["partition_ms"] = timeit(jp, x2, keep) * 1e3
    res["partition_sort_ms"] = timeit(jc, x2, keep) * 1e3
    log(f"partition 32M (L=3): {res['partition_ms']:.1f} ms vs "
        f"stable-sort compact {res['partition_sort_ms']:.1f} ms "
        f"-> {res['partition_sort_ms']/res['partition_ms']:.2f}x")
    jl = jax.jit(lambda x: packed.sort(x[:2])[0])
    res["lane_sort_ms"] = timeit(jl, x2[:, :N]) * 1e3
    log(f"lax.sort (L=2, N=16M): {res['lane_sort_ms']:.1f} ms "
        f"(the remaining sort primitive)")
    return res


def bench_query(boss, seqs):
    """Secondary metric: batched query throughput (reads/sec)."""
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
    bq.get_labels_batch(reads, 0.7)
    dt = time.time() - t0
    log(f"query: {len(reads)} reads in {dt:.3f}s -> "
        f"{len(reads)/dt:.0f} reads/s (batched label queries)")
    return len(reads) / dt


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
    return len(reads) / dt


def main():
    out = {
        "metric": "build_kmers_per_sec",
        "value": 0.0,
        "unit": "kmers/sec (transcripts_1000.fa k=20 full BOSS build)",
        "vs_baseline": 0.0,
    }
    try:
        platform = ensure_backend()
    except Exception as e:
        log(f"backend init irrecoverable: {e}")
        out["error"] = f"backend: {e}"
        print(json.dumps(out))
        return
    out["backend"] = platform

    try:
        import jax
        kind = jax.devices()[0].device_kind
        bw = next((v for k, v in HBM_BW.items() if kind.startswith(k)),
                  HBM_BW["cpu"])
    except Exception:
        kind, bw = "unknown", HBM_BW["cpu"]
    log(f"device: {kind}, assumed HBM BW {bw/1e9:.0f} GB/s")

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

    boss = None
    try:
        dt, boss = tpu_build_seconds(seqs)
        total_windows = base["total_windows"]
        value = total_windows / dt
        log(f"warm TPU full build: {dt:.3f} s -> {value/1e6:.2f} Mk-mers/s "
            f"(full pipeline incl. dummy gen + emit)")
        out["value"] = round(value, 1)
        out["vs_baseline"] = round(value / base["kmers_per_sec"], 3)
    except Exception as e:
        log(f"headline build bench failed: {e}")
        traceback.print_exc(file=sys.stderr)
        out["error"] = f"build: {e}"

    # Capacity + roofline (headline #2) — skipped on the CPU fallback,
    # where a 33M-edge build would take many minutes and mean nothing.
    if platform != "cpu":
        try:
            cap_rate, cap_pct = bench_capacity(bw)
            out["capacity_kmers_per_sec"] = round(cap_rate, 1)
            out["capacity_roofline_pct"] = round(100 * cap_pct, 2)
        except Exception as e:
            log(f"capacity bench failed: {e}")
            out.setdefault("error", f"capacity: {e}")
        try:
            dev_rate, dev_pct = bench_capacity_device(bw)
            out["capacity_device_kmers_per_sec"] = round(dev_rate, 1)
            out["capacity_device_roofline_pct"] = round(100 * dev_pct, 2)
        except Exception as e:
            log(f"device-resident capacity bench failed: {e}")
        try:
            kres = bench_kernels(bw)
            out["merge_16m_ms"] = round(kres["merge_ms"], 2)
            out["merge_vs_sort_x"] = round(
                kres["merge_sort_ms"] / kres["merge_ms"], 2)
            out["partition_32m_ms"] = round(kres["partition_ms"], 2)
            out["partition_vs_sort_x"] = round(
                kres["partition_sort_ms"] / kres["partition_ms"], 2)
            out["sort_l2_n16m_ms"] = round(kres["lane_sort_ms"], 2)
        except Exception as e:
            log(f"kernel bench failed: {e}")

    # Align + query are headline metrics (VERDICT r4 #3): the north star
    # names aligned reads/sec/chip, so the driver must capture them.
    if boss is not None:
        try:
            out["query_reads_per_sec"] = round(bench_query(boss, seqs), 1)
        except Exception as e:
            log(f"query bench failed: {e}")
            traceback.print_exc(file=sys.stderr)
        try:
            out["align_reads_per_sec"] = round(bench_align_batch(boss, seqs), 1)
        except Exception as e:
            log(f"align bench failed: {e}")
            traceback.print_exc(file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
