"""metagraph_tpu — a TPU-native annotated de Bruijn graph framework.

A from-scratch re-design of MetaGraph (ratschlab/projects2014-metagenome)
for TPUs: packed k-mer tensors + XLA sort/scan/gather kernels replace the
reference's succinct CPU data structures; jax.sharding meshes + collectives
replace its file-based sharding; Pallas kernels cover the hot paths.
"""

__version__ = "0.1.0"
