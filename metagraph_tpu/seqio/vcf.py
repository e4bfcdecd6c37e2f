"""VCF variant expansion (reference: metagraph/src/seq_io/vcf_parser.hpp).

For each VCF record, emits ``reference[pos-k:pos] + ALT +
reference[pos+len(REF):pos+len(REF)+k]`` per alternate allele — the
k-flank context window whose k-mers cover the variant (the reference
fetches the same flanks via htslib faidx, vcf_parser.cpp:150-175).
Optionally attaches labels from sample genotype columns for annotated
builds (call_annotated_sequences)."""

from __future__ import annotations

import gzip
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from .fasta import parse_records, _open_maybe_gz


def _load_reference(fasta_path: str) -> Dict[str, bytes]:
    return {rec.name.decode(): rec.seq for rec in parse_records(fasta_path)}


def parse_vcf(
    vcf_path: str,
    reference_fasta: str,
    k: int,
    with_annotations: bool = False,
) -> Iterator[Tuple[bytes, List[str]]]:
    """Yield (sequence, labels) per alternate allele. Labels are the
    sample names whose genotype includes the allele (empty when
    with_annotations is False)."""
    ref = _load_reference(reference_fasta)
    handle = _open_maybe_gz(vcf_path)
    samples: List[str] = []
    try:
        for raw in handle:
            line = raw.decode().rstrip("\n")
            if not line:
                continue
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                cols = line.split("\t")
                samples = cols[9:]
                continue
            cols = line.split("\t")
            chrom, pos, _id, ref_allele, alts = (
                cols[0], int(cols[1]) - 1, cols[2], cols[3], cols[4])
            if chrom not in ref:
                continue
            seq = ref[chrom]
            prefix = seq[max(0, pos - k):pos]
            end = pos + len(ref_allele)
            suffix = seq[end:end + k]
            gt_per_sample = []
            if with_annotations and len(cols) > 9:
                gt_per_sample = [c.split(":")[0] for c in cols[9:]]
            for ai, alt in enumerate(alts.split(",")):
                if alt.startswith("<"):      # symbolic alleles unsupported
                    continue
                labels: List[str] = []
                if with_annotations:
                    want = str(ai + 1)
                    for si, gt in enumerate(gt_per_sample):
                        if want in gt.replace("|", "/").split("/"):
                            labels.append(samples[si] if si < len(samples)
                                          else f"sample_{si}")
                yield prefix + alt.encode() + suffix, labels
    finally:
        handle.close()


def vcf_to_sequences(vcf_path: str, reference_fasta: str, k: int
                     ) -> List[bytes]:
    return [s for s, _ in parse_vcf(vcf_path, reference_fasta, k)]
