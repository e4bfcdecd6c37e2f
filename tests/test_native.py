"""Native C codec vs the Python parser (byte-for-byte)."""

import numpy as np
import pytest

from conftest import random_dna
from metagraph_tpu.kmer.alphabets import DNA
from metagraph_tpu.kmer.extractor import encode_sequences
from metagraph_tpu.native import fasta_encode_native, native_available
from metagraph_tpu.seqio.fasta import read_and_encode, read_sequences

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C toolchain")


def test_fasta_roundtrip(tmp_path, rng):
    seqs = [random_dna(rng, n) for n in (80, 200, 1)]
    path = str(tmp_path / "x.fa")
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            # multi-line records with \r\n noise
            f.write(f">rec{i} comment here\n")
            body = s.decode()
            for j in range(0, len(body), 60):
                f.write(body[j:j + 60] + "\n")
    got = read_and_encode(path, DNA)
    want = encode_sequences(seqs, DNA)
    np.testing.assert_array_equal(got, want)


def test_fastq_roundtrip(tmp_path, rng):
    seqs = [random_dna(rng, 50) for _ in range(4)]
    path = str(tmp_path / "x.fq")
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i}\n{s.decode()}\n+\n{'I' * len(s)}\n")
    got = read_and_encode(path, DNA)
    want = encode_sequences(seqs, DNA)
    np.testing.assert_array_equal(got, want)


def test_offsets_and_invalid_chars(rng):
    data = b">a\nACGTNNACGT\n>b\nTT-TT\n"
    codes, offsets = fasta_encode_native(data, DNA.encode_table())
    assert list(offsets) == [0, 11]
    # invalid chars map to the separator/invalid code
    assert codes[4] == 255 and codes[5] == 255
