"""Host-side FASTA/FastQ streaming I/O.

Replaces the reference's kseq.h-based readers
(metagraph/src/seq_io/sequence_io.hpp:22-218). Pure-Python but batched:
the parser yields large read batches (as lists of bytes) that the device
pipeline encodes into contiguous uint8 code tensors; parsing overlaps with
device compute when used through BatchFeeder (pipeline parallelism — the
reference's ThreadPool/BatchAccumulator role, batch_accumulator.hpp:17).
"""

from __future__ import annotations

import gzip
import io
import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple


def _open_maybe_gz(path: str):
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rb")
    return open(path, "rb")


@dataclass
class SeqRecord:
    name: bytes
    seq: bytes
    qual: Optional[bytes] = None
    comment: bytes = b""


def parse_records(path_or_handle) -> Iterator[SeqRecord]:
    """Parse FASTA or FastQ (auto-detected by leading '>' / '@')."""
    handle = (_open_maybe_gz(path_or_handle)
              if isinstance(path_or_handle, (str, os.PathLike)) else path_or_handle)
    close = isinstance(path_or_handle, (str, os.PathLike))
    try:
        first = handle.readline()
        while first and not first.strip():
            first = handle.readline()
        if not first:
            return
        if first.startswith(b">"):
            yield from _parse_fasta(handle, first)
        elif first.startswith(b"@"):
            yield from _parse_fastq(handle, first)
        else:
            raise ValueError("not a FASTA/FastQ stream")
    finally:
        if close:
            handle.close()


def _split_header(line: bytes) -> Tuple[bytes, bytes]:
    h = line[1:].strip()
    if b" " in h:
        name, comment = h.split(b" ", 1)
        return name, comment
    return h, b""


def _parse_fasta(handle, first: bytes) -> Iterator[SeqRecord]:
    name, comment = _split_header(first)
    chunks: List[bytes] = []
    for line in handle:
        if line.startswith(b">"):
            yield SeqRecord(name, b"".join(chunks), None, comment)
            name, comment = _split_header(line)
            chunks = []
        else:
            chunks.append(line.strip())
    yield SeqRecord(name, b"".join(chunks), None, comment)


def _parse_fastq(handle, first: bytes) -> Iterator[SeqRecord]:
    line = first
    while line:
        name, comment = _split_header(line)
        seq = handle.readline().strip()
        handle.readline()  # '+'
        qual = handle.readline().strip()
        yield SeqRecord(name, seq, qual, comment)
        line = handle.readline()
        while line and not line.strip():
            line = handle.readline()


def read_sequences(path: str) -> List[bytes]:
    return [r.seq for r in parse_records(path)]


def read_and_encode(path: str, alphabet) -> "np.ndarray":
    """File -> encoded code array with separators, using the native C
    codec when available (one pass, no per-record Python), else the
    Python parser (reference kseq reader role)."""
    import numpy as np
    from ..kmer.extractor import encode_sequences
    from ..native import fasta_encode_native
    with _open_maybe_gz(path) as f:
        data = f.read()
    res = fasta_encode_native(data, alphabet.encode_table())
    if res is not None:
        return res[0]
    seqs = [r.seq for r in parse_records(path)]
    return encode_sequences(seqs, alphabet)


def iter_batches(paths: Sequence[str], batch_bytes: int = 100 << 20
                 ) -> Iterator[List[SeqRecord]]:
    """Yield record batches of ~batch_bytes of sequence (the reference's
    100MB query batching default, cli/config/config.hpp:98)."""
    batch: List[SeqRecord] = []
    size = 0
    for path in paths:
        for rec in parse_records(path):
            batch.append(rec)
            size += len(rec.seq)
            if size >= batch_bytes:
                yield batch
                batch, size = [], 0
    if batch:
        yield batch


class BatchFeeder:
    """Background-thread prefetcher: overlap host parsing with device work."""

    _DONE = object()

    def __init__(self, it: Iterable, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None

        def run():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as e:  # propagated to consumer
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item


class FastaWriter:
    """Plain/gz FASTA writer (reference FastaWriter, sequence_io.hpp:43)."""

    def __init__(self, path: str, header: str = "", enumerate_sequences: bool = True,
                 gzip_out: Optional[bool] = None, width: int = 80):
        if gzip_out is None:
            gzip_out = path.endswith(".gz")
        self._f = gzip.open(path, "wb") if gzip_out else open(path, "wb")
        self._header = header
        self._count = 0
        self._enumerate = enumerate_sequences
        self._width = width

    def write(self, seq: bytes | str, name: Optional[str] = None):
        if isinstance(seq, str):
            seq = seq.encode()
        self._count += 1
        if name is None:
            name = f"{self._header}{self._count}" if self._enumerate else self._header
        self._f.write(b">" + name.encode() + b"\n")
        for i in range(0, len(seq), self._width):
            self._f.write(seq[i:i + self._width] + b"\n")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class ExtendedFastaWriter(FastaWriter):
    """FASTA writer with a per-k-mer count sidecar
    (reference ExtendedFastaWriter, sequence_io.hpp:96-218): sequences go
    to ``<base>.fasta.gz`` and counts to ``<base>.kmer_counts.gz`` — one
    text line of space-separated uint32 counts per record, aligned with
    the record order (our own container format; the role, not the bytes,
    of the reference's serialized variant)."""

    def __init__(self, base: str, k: int, header: str = "",
                 enumerate_sequences: bool = True):
        for suf in (".gz", ".fasta"):
            if base.endswith(suf):
                base = base[:-len(suf)]
        super().__init__(base + ".fasta.gz", header, enumerate_sequences)
        self.k = k
        self._cf = gzip.open(base + ".kmer_counts.gz", "wb")

    def write(self, seq, counts=None, name: Optional[str] = None):
        super().write(seq, name)
        n_kmers = len(seq) - self.k + 1
        if counts is None:
            counts = [1] * n_kmers
        assert len(counts) == n_kmers, (len(counts), n_kmers)
        self._cf.write(" ".join(str(int(c)) for c in counts).encode() + b"\n")

    def close(self):
        super().close()
        self._cf.close()


def kmer_counts_sidecar(path: str) -> Optional[str]:
    """Path of the ``.kmer_counts.gz`` sidecar for a FASTA file, if any
    (reference parse_sequences.hpp:107-113)."""
    base = path
    for suf in (".gz", ".fasta", ".fa"):
        if base.endswith(suf):
            base = base[:-len(suf)]
    side = base + ".kmer_counts.gz"
    return side if os.path.exists(side) else None


def iter_weighted_records(path: str) -> Iterator[Tuple[SeqRecord, "np.ndarray"]]:
    """Yield (record, per-k-mer counts) pairs from a FASTA + sidecar."""
    import numpy as np
    side = kmer_counts_sidecar(path)
    assert side is not None
    with gzip.open(side, "rb") as cf:
        for rec, line in zip(parse_records(path), cf):
            counts = np.array([int(x) for x in line.split()], np.uint32)
            yield rec, counts
