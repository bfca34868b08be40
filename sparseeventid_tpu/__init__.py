"""sparseeventid_tpu — a TPU-native (JAX/XLA/Pallas) sparse-event-ID framework.

Rebuilds the capabilities of coreyjadams/SparseEventID (neutrino event
classification on sparse LArTPC data) with a TPU-first architecture:
fixed-capacity COO sparse tensors, sort/searchsorted rulebooks, implicit-GEMM
sparse convolutions, shard_map data parallelism, and a host-side HDF5 IO
pipeline.
"""

__version__ = "0.1.0"
