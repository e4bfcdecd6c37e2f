"""Profile align_batch on the TPU: where do the reads/s go?

Usage: python scripts/profile_align.py [n_reads=2048] [read_len=100]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
RL = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def main():
    from metagraph_tpu.align.aligner import Aligner, AlignerConfig
    from metagraph_tpu.graph.boss_construct import build_boss
    from metagraph_tpu.graph.dbg_succinct import DbgSuccinct
    from metagraph_tpu.kmer.alphabets import DNA

    rng = np.random.default_rng(0)
    letters = np.frombuffer(b"ACGT", np.uint8)
    # transcripts-scale graph: ~8M distinct k-mers
    seqs = [bytes(letters[rng.integers(0, 4, 1 << 20)]) for _ in range(8)]
    k = 31
    t0 = time.time()
    g = DbgSuccinct.from_boss(build_boss(seqs, k), DNA, "basic")
    print(f"graph: {g.num_nodes()} nodes ({time.time()-t0:.1f}s)",
          flush=True)
    sub = {65: 67, 67: 71, 71: 84, 84: 65}
    reads = []
    for _ in range(N):
        s = seqs[rng.integers(0, len(seqs))]
        p = rng.integers(0, len(s) - RL - 5)
        r = bytearray(s[p:p + RL])
        q = rng.integers(10, RL - 10)
        r[q] = sub[r[q]]
        reads.append(bytes(r))
    al = Aligner(g)
    for with_cigar in (False, True):
        al.align_batch(reads[:N], with_cigar=with_cigar)  # compile+warm
        t0 = time.time()
        res = al.align_batch(reads[:N], with_cigar=with_cigar)
        dt = time.time() - t0
        ok = sum(1 for r in res if r)
        print(f"align_batch n={N} cigar={with_cigar}: {dt:.2f}s "
              f"-> {N/dt:.0f} reads/s ({ok} aligned)", flush=True)


if __name__ == "__main__":
    main()
