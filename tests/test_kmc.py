"""KMC database reader tests.

KMC1 parsing is exercised end-to-end against the reference's checked-in
databases via tests/test_cli.py (exact node-count oracles). This file
covers the KMC2 signature-mapped layout with a synthetic database
written per the documented format (seqio/kmc.py module docstring):
per-bin prefix LUTs concatenated in record order plus a signature map.
"""

import struct

import numpy as np
import pytest

from metagraph_tpu.seqio.kmc import read_header, read_kmers


def _write_kmc2(tmp_path, kmers: np.ndarray, counts: np.ndarray,
                k: int, p: int, sig_len: int, n_bins: int,
                both_strands_byte: int = 1):
    """Write a KMC2-format .kmc_pre/.kmc_suf pair.

    ``kmers``: (n, k) uint8 with 2-bit codes A=0..T=3. Records are
    assigned to bins by their first character (mod n_bins) and sorted by
    (bin, k-mer integer) — the KMC2 record order.
    """
    n = len(kmers)
    weights = (4 ** np.arange(k - 1, -1, -1)).astype(object)
    ints = np.array([int(sum(int(c) * int(w) for c, w in zip(row, weights)))
                     for row in kmers], object)
    bins = kmers[:, 0].astype(np.int64) % n_bins
    order = np.lexsort((ints, bins))
    kmers, counts, ints, bins = (kmers[order], counts[order], ints[order],
                                 bins[order])
    n_pref = 4 ** p
    prefixes = np.array([int(x) >> (2 * (k - p)) for x in ints], np.int64)
    # per-bin LUT: start record index of each (bin, prefix) bucket
    bucket = bins * n_pref + prefixes
    lut = np.searchsorted(bucket, np.arange(n_bins * n_pref))
    # suffix records
    s_len = k - p
    s_bytes = (s_len + 3) // 4
    counter_size = 2
    suf = bytearray(b"KMCS")
    for row, c in zip(kmers, counts):
        rec = 0
        packed = bytearray(s_bytes)
        for j, code in enumerate(row[p:]):
            packed[j // 4] |= int(code) << (2 * (3 - (j % 4)))
        suf += bytes(packed)
        suf += int(c).to_bytes(counter_size, "little")
    suf += b"KMCS"
    # header: 9 uint32 fields, both_strands byte, pad, version last
    hdr = struct.pack("<9I", k, 0, counter_size, p, sig_len,
                      1, 1_000_000_000, n, 0)
    hdr += bytes([both_strands_byte])
    hdr += b"\0" * (64 - len(hdr) - 4)
    hdr += struct.pack("<I", 0x200)
    sig_map = np.zeros((4 ** sig_len) + 1, np.uint32)  # unused by reader
    pre = (b"KMCP" + lut.astype("<u8").tobytes() + sig_map.tobytes()
           + hdr + struct.pack("<I", len(hdr)) + b"KMCP")
    base = str(tmp_path / "db")
    with open(base + ".kmc_pre", "wb") as f:
        f.write(pre)
    with open(base + ".kmc_suf", "wb") as f:
        f.write(bytes(suf))
    return base


def test_kmc2_round_trip(tmp_path, rng):
    k, p, sig_len, n_bins = 11, 4, 5, 3
    n = 500
    kmers = rng.integers(0, 4, size=(n, k)).astype(np.uint8)
    # dedupe (KMC stores distinct k-mers)
    kmers = np.unique(kmers, axis=0)
    counts = rng.integers(1, 1000, size=len(kmers)).astype(np.int64)
    base = _write_kmc2(tmp_path, kmers, counts, k, p, sig_len, n_bins)

    hdr = read_header(base + ".kmc_pre")
    assert hdr.version == 0x200
    assert hdr.signature_len == sig_len
    assert hdr.kmer_length == k
    assert hdr.total_kmers == len(kmers)
    assert hdr.num_lut_entries == n_bins * 4 ** p
    assert not hdr.both_strands

    chars, got_counts, _ = read_kmers(base)
    # read_kmers returns sentinel-alphabet codes (A=1..T=4)
    got = {(bytes(row), int(c)) for row, c in zip(chars - 1, got_counts)}
    want = {(bytes(row), int(c)) for row, c in zip(kmers, counts)}
    assert got == want


def test_kmc2_both_strands_expansion(tmp_path, rng):
    k, p = 7, 3
    kmers = np.unique(rng.integers(0, 4, size=(40, k)).astype(np.uint8),
                      axis=0)
    counts = rng.integers(1, 50, size=len(kmers)).astype(np.int64)
    base = _write_kmc2(tmp_path, kmers, counts, k, p, sig_len=4, n_bins=2,
                       both_strands_byte=0)  # 0 = canonical counting
    hdr = read_header(base + ".kmc_pre")
    assert hdr.both_strands
    chars, got_counts, _ = read_kmers(base)
    rc = 5 - (kmers + 1)[:, ::-1]
    n_pal = int(((kmers + 1) == rc).all(axis=1).sum())
    assert len(chars) == 2 * len(kmers) - n_pal


def test_kmc1_reference_header():
    """The checked-in reference databases parse as KMC1."""
    path = ("/root/reference/metagraph/tests/data/"
            "transcripts_1000_kmc_counters.kmc_pre")
    hdr = read_header(path)
    assert hdr.version == 0
    assert hdr.kmer_length == 11
    assert hdr.total_kmers == 469983
    assert hdr.num_lut_entries == 4 ** hdr.lut_prefix_length


def test_kmc_malformed_rejected(tmp_path):
    bad = tmp_path / "bad.kmc_pre"
    bad.write_bytes(b"KMCPgarbagegarbageKMCP")
    with pytest.raises(ValueError):
        read_header(str(bad))
