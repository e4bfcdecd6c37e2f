"""Test configuration: run on a simulated 8-device CPU mesh.

Multi-chip sharding logic is validated on virtual CPU devices (the driver
separately dry-runs the multichip path); the real-TPU path is exercised by
bench.py. Set env BEFORE importing jax anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# separate compile-cache namespace for the CPU test backend (the shared
# cache may hold AOT results compiled by the remote TPU toolchain for a
# different host profile)
os.environ.setdefault("METAGRAPH_TPU_XLA_CACHE", "/tmp/metagraph_xla_cache_cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment pre-imports jax with a TPU backend (sitecustomize);
# env vars alone are too late — force the config directly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

REFERENCE_DATA = "/root/reference/metagraph/tests/data"


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    """XLA:CPU's compiler intermittently segfaults (roaming across
    modules: ranksel's search programs, pallas interpret tests) once
    hundreds of compiled executables from earlier modules are resident
    in the process — full-suite runs only; every bisected subset passes.
    Dropping the jit/compile caches at each module boundary keeps the
    compiler within tested territory at the cost of some recompiles."""
    import jax
    jax.clear_caches()
    yield


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def random_dna(rng, n: int) -> bytes:
    return bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n))
