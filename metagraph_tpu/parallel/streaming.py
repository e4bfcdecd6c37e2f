"""Streaming collection: host-RAM spill for inputs beyond HBM.

The reference bounds memory with SortedSetDisk: fill a RAM buffer, sort,
spill Elias-Fano chunks to disk, k-way-merge the chunks
(metagraph/src/common/sorted_sets/sorted_set_disk_base.hpp:34,
elias_fano_merger.hpp:188). The TPU analog uses host RAM as the spill
tier (and the OS page cache / files beyond that):

  input chunks -> device extract+sort+unique -> host chunk arrays ->
  host k-way merge (numpy mergesort of pre-sorted runs) ->
  device finish (dummies + emit) per suffix shard if needed

Each device pass works on a bounded window (``chunk_codes`` characters),
so HBM usage is constant regardless of input size; the merge is linear
in the output. Counts aggregate across chunks.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..common import packed
from ..graph.boss import Boss
from ..graph.boss_construct import (MODE_BASIC, MODE_CANONICAL, MODE_PRIMARY,
                                    _bucket, _collect_stage,
                                    build_boss_from_kmers)
from ..kmer import packing
from ..kmer.alphabets import Alphabet, DNA, INVALID_CODE
from ..kmer.extractor import encode_sequences


def _merge_sorted_chunks(chunks: List[Tuple[np.ndarray, np.ndarray]],
                         L: int) -> Tuple[np.ndarray, np.ndarray]:
    """K-way merge of sorted (lanes (L, n), counts (n,)) host chunks with
    duplicate aggregation. Uses numpy structured sort over concatenated
    runs (mergesort exploits pre-sorted runs)."""
    if not chunks:
        return np.zeros((L, 0), np.uint32), np.zeros((0,), np.int64)
    lanes = np.concatenate([c[0] for c in chunks], axis=1)
    counts = np.concatenate([c[1] for c in chunks]).astype(np.int64)
    # lexicographic order over lanes: use structured view for mergesort
    keys = np.rec.fromarrays([lanes[j] for j in range(L)])
    order = np.argsort(keys, kind="stable")  # timsort-ish on runs
    lanes = lanes[:, order]
    counts = counts[order]
    if lanes.shape[1] == 0:
        return lanes, counts
    first = np.concatenate([[True],
                            (lanes[:, 1:] != lanes[:, :-1]).any(axis=0)])
    group = np.cumsum(first) - 1
    agg = np.zeros(int(group[-1]) + 1, np.int64)
    np.add.at(agg, group, counts)
    return lanes[:, first], agg


def collect_kmers_streaming(
    seqs: Sequence[bytes],
    K: int,
    alphabet: Alphabet = DNA,
    canonical: bool = False,
    chunk_codes: int = 1 << 22,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sorted unique k-mers + counts for arbitrarily large inputs with a
    bounded device working set. Returns host arrays."""
    B = alphabet.bits_per_char
    L = packing.lanes_for(K, B)
    chunks: List[Tuple[np.ndarray, np.ndarray]] = []
    buf = np.full(chunk_codes, INVALID_CODE, np.uint8)
    fill = 0

    def flush():
        nonlocal fill
        if fill == 0:
            return
        ulanes, ucounts, ucount = _collect_stage(
            jnp.asarray(buf), K, B, (), canonical, alphabet.complement)
        n = int(ucount)
        chunks.append((np.asarray(ulanes[:, :n]),
                       np.asarray(ucounts[:n])))
        buf.fill(INVALID_CODE)
        fill = 0

    tbl = alphabet.encode_table()
    for s in seqs:
        codes = tbl[np.frombuffer(bytes(s), np.uint8)]
        pos = 0
        while pos < len(codes):
            space = chunk_codes - fill - 1
            if space < K:          # not enough room for a full window
                flush()
                space = chunk_codes - 1
            take = min(space, len(codes) - pos)
            buf[fill:fill + take] = codes[pos:pos + take]
            fill += take + 1       # leave one INVALID separator
            # overlap chunks by K-1 so no window is lost at the boundary
            pos += take
            if pos < len(codes):
                pos = max(0, pos - (K - 1))
    flush()
    return _merge_sorted_chunks(chunks, L)


def build_boss_streaming(
    seqs: Sequence[bytes],
    k: int,
    alphabet: Alphabet = DNA,
    mode: str = MODE_BASIC,
    bits_per_count: int = 0,
    chunk_codes: int = 1 << 22,
) -> Boss:
    """End-to-end build with host-spill collection."""
    canonical = mode in (MODE_CANONICAL, MODE_PRIMARY)
    lanes_np, counts_np = collect_kmers_streaming(
        seqs, k, alphabet, canonical=canonical, chunk_codes=chunk_codes)
    n = lanes_np.shape[1]
    cap = _bucket(n)
    lanes = packed.pad_to(jnp.asarray(lanes_np), cap)
    counts = jnp.concatenate([
        jnp.asarray(np.minimum(counts_np, (1 << 31) - 1).astype(np.int32)),
        jnp.zeros((cap - n,), jnp.int32)])
    return build_boss_from_kmers(
        lanes, counts, n, k, alphabet,
        mode=MODE_CANONICAL if mode == MODE_CANONICAL else MODE_BASIC,
        bits_per_count=bits_per_count)
