"""Sparse-convolution core ops: the TPU-native engine replacing SparseConvNet.

All ops are pure JAX functions over fixed-capacity batched COO tensors; Pallas
fast paths live in ops/pallas and are numerically interchangeable.
"""

from .sparse_tensor import (  # noqa: F401
    INVALID_KEY,
    SparseTensor,
    build_sparse_tensor,
    from_dense,
    linearize,
    to_dense,
    unlinearize,
)
from .rulebook import (  # noqa: F401
    Rulebook,
    build_downsample,
    build_submanifold_rulebook,
    build_upsample,
    kernel_offsets,
)
from .conv import (  # noqa: F401
    apply_conv,
    average_pool,
    deconv,
    gather_neighbors,
    strided_conv,
    submanifold_conv,
)
from .norm import apply_norm, masked_batch_stats, masked_group_norm  # noqa: F401
from .pool import global_avg_pool, global_max_pool  # noqa: F401
