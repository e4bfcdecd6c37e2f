import sys, os
sys.path.insert(0, "/root/repo")
import time, numpy as np
import jax
from metagraph_tpu.seqio.fasta import read_sequences as read_fasta
from metagraph_tpu.graph.boss_construct import (collect_kmers,
    build_boss_from_kmers, build_boss)
from metagraph_tpu.kmer.alphabets import DNA
from metagraph_tpu.graph.boss import Boss, _finalize_ranks, _build_lut

DATA = "/root/reference/metagraph/tests/data/transcripts_1000.fa"
K = 20
seqs = read_fasta(DATA)

# warm everything
boss = build_boss(seqs, K)
np.asarray(boss.W[:1])

for it in range(3):
    t0 = time.time()
    real, counts, n_real = collect_kmers(seqs, K, DNA, canonical=False)
    real.block_until_ready()
    t1 = time.time()
    boss = build_boss_from_kmers(real, counts, n_real, K, DNA)
    np.asarray(boss.W[:1])
    t2 = time.time()
    print(f"iter{it}: collect={t1-t0:.3f}s finish+ranks={t2-t1:.3f}s total={t2-t0:.3f}s")

# now isolate the finalize/lut cost using last build's arrays: re-run from_arrays
# grab W/last/F/edge_lanes as inputs
W = boss.W_rank.seq
last = jax.numpy.asarray(boss.last_rank.bits_host())
F = boss.F
lanes = boss.edge_lanes
for it in range(2):
    t0 = time.time()
    out = _finalize_ranks(W, last, F, sigma=2*DNA.size, n=int(last.shape[0]))
    jax.block_until_ready(out)
    t1 = time.time()
    lut, mb = _build_lut(lanes)
    v = int(mb)
    t2 = time.time()
    print(f"finalize_ranks={t1-t0:.3f}s build_lut+sync={t2-t1:.3f}s")
