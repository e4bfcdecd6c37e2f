"""Phase-level align_batch profile: seeding / fwd scan / bwd scan /
cigars / host glue.

Usage: python scripts/profile_align2.py [n_reads=512] [read_len=100]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
RL = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def main():
    from metagraph_tpu.align import aligner as al_mod
    from metagraph_tpu.align import batch_extender as be
    from metagraph_tpu.align.aligner import Aligner
    from metagraph_tpu.graph.boss_construct import build_boss
    from metagraph_tpu.graph.dbg_succinct import DbgSuccinct
    from metagraph_tpu.kmer.alphabets import DNA

    rng = np.random.default_rng(0)
    letters = np.frombuffer(b"ACGT", np.uint8)
    seqs = [bytes(letters[rng.integers(0, 4, 1 << 20)]) for _ in range(8)]
    k = 31
    t0 = time.time()
    g = DbgSuccinct.from_boss(build_boss(seqs, k), DNA, "basic")
    print(f"graph: {g.num_nodes()} nodes ({time.time()-t0:.1f}s)", flush=True)
    sub = {65: 67, 67: 71, 71: 84, 84: 65}
    reads = []
    for _ in range(N):
        s = seqs[rng.integers(0, len(seqs))]
        p = rng.integers(0, len(s) - RL - 5)
        r = bytearray(s[p:p + RL])
        q = rng.integers(10, RL - 10)
        r[q] = sub[r[q]]
        reads.append(bytes(r))

    acc = {}

    def timed(name, fn):
        def wrap(*a, **kw):
            t0 = time.time()
            out = fn(*a, **kw)
            acc[name] = acc.get(name, 0.0) + (time.time() - t0)
            acc[name + "_calls"] = acc.get(name + "_calls", 0) + 1
            return out
        return wrap

    orig_ext = be.beam_extend_batch
    orig_cig = be.batched_cigars
    orig_map = al_mod._map_batch_nodes
    al = Aligner(g)

    al.align_batch(reads)                       # warm / compile
    # patch AFTER warm-up so timings are warm
    be_timed = timed("extend", orig_ext)
    cig_timed = timed("cigars", orig_cig)
    map_timed = timed("seed_map", orig_map)
    al_mod._map_batch_nodes = map_timed
    import metagraph_tpu.align.aligner as A
    # align_batch imports beam_extend_batch inside the call — patch module
    be.beam_extend_batch = be_timed
    be.batched_cigars = cig_timed

    t0 = time.time()
    res = al.align_batch(reads)
    total = time.time() - t0
    ok = sum(1 for r in res if r)
    print(f"total {total:.2f}s -> {N/total:.0f} reads/s ({ok} aligned)")
    for kk in ("seed_map", "extend", "cigars"):
        print(f"{kk:10s} {acc.get(kk, 0)*1e3:8.1f} ms "
              f"({acc.get(kk + '_calls', 0)} calls)")
    glue = total - sum(acc.get(kk, 0) for kk in
                       ("seed_map", "extend", "cigars"))
    print(f"{'host glue':10s} {glue*1e3:8.1f} ms")

    al_mod._map_batch_nodes = orig_map
    be.beam_extend_batch = orig_ext
    be.batched_cigars = orig_cig


if __name__ == "__main__":
    main()
