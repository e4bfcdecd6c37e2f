"""metagraph_tpu — a TPU-native annotated de Bruijn graph framework.

A from-scratch re-design of MetaGraph (ratschlab/projects2014-metagenome)
for TPUs: packed k-mer tensors + XLA sort/scan/gather kernels replace the
reference's succinct CPU data structures; jax.sharding meshes + collectives
replace its file-based sharding; Pallas kernels cover the hot paths.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the TPU toolchain here remote-compiles
# (~tens of seconds per kernel); caching across processes makes CLI runs
# and benches start warm.
# Skip on the CPU backend: this environment routes compiles through a
# remote toolchain whose AOT results target a different host profile.
if _os.environ.get("JAX_PLATFORMS", "") != "cpu":
    try:
        _cache_dir = _os.environ.get(
            "METAGRAPH_TPU_XLA_CACHE",
            _os.path.expanduser("~/.cache/metagraph_tpu_xla"))
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization only
        pass
