"""Golden parity tests against the reference's own integration-test
oracles (mirrors metagraph/integration_tests/*.py assertions).

The reference binary cannot be built in this environment (all vendored
submodules under external-libraries/ are empty and there is no network
egress), so the checked-in expected values from the reference's
integration tests — exact stats node counts, byte-exact query output
lengths, exact align TSV lines, GFA record counts, clean/weighted
statistics — serve as the behavioral oracle
(test_build.py:61, test_query.py:149-159,846-856, test_align.py:53-61,
test_assemble.py:14-37, test_clean.py:119-146,167-172,
test_build_weighted.py:62-66, test_annotate.py:79-82).

The full matrix lives in scripts/golden_probe.py; this module runs its
groups through pytest so the suite stays green on parity regressions.
"""

import importlib.util
import os
import sys

import pytest

_spec = importlib.util.spec_from_file_location(
    "golden_probe",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "golden_probe.py"))
golden_probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(golden_probe)


def _run_group(name):
    golden_probe.FAILURES.clear()
    golden_probe.GROUPS[name]()
    assert not golden_probe.FAILURES, "\n".join(golden_probe.FAILURES)


def test_golden_mt_align():
    """genome.MT builds (basic/canonical/primary) + byte-exact align TSV
    + map counts (test_align.py)."""
    _run_group("mt")


def test_golden_t100_annotate():
    """transcripts_100 node counts + annotation density
    (test_annotate.py, test_query.py setUpClass)."""
    _run_group("t100")


def test_golden_query_bytes():
    """Byte-exact query stdout lengths vs the reference
    (test_query.py:149-159, TestQueryCanonical:846-856)."""
    _run_group("query")


def test_golden_weighted_builds():
    """Weighted build avg-weight oracles incl. count saturation
    (test_build_weighted.py)."""
    _run_group("weighted")


def test_golden_kmc_builds():
    """KMC database builds, both-strands expansion, weighted counts
    (test_build.py:177-218)."""
    _run_group("kmc")


def test_golden_clean():
    """clean round-trips: no-op, prune-tips, prune-unitigs, both
    (test_clean.py)."""
    _run_group("clean")


def test_golden_assemble_gfa():
    """Compacted GFA record counts + link validity (test_assemble.py)."""
    _run_group("assemble")
