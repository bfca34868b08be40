"""Global pooling over sparse tensors.

The reference pools with scn.SparseToDense followed by torch.nn.AvgPool3d over
the full final spatial shape (/root/reference/src/networks/resnet.py:122-128,
classification_head.py:22).  Dense average pooling divides by the FULL volume
(inactive voxels contribute zeros), so the sparse-native equivalent is a
masked sum divided by prod(spatial) — no densification needed on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sparse_tensor import SparseTensor


def global_avg_pool(st: SparseTensor, divide_by: str = "volume") -> jax.Array:
    """[B, C] pooled features.

    divide_by='volume' matches dense AvgPool over the grid (the reference
    head's semantics); 'active' divides by n_active instead (a physically
    nicer mean, exposed for new configs).
    """
    m = st.row_mask()[..., None].astype(st.feats.dtype)
    s = jnp.sum(st.feats * m, axis=1)  # [B, C]
    if divide_by == "volume":
        denom = jnp.asarray(float(np.prod(st.grid_shape)), s.dtype)
        return s / denom
    elif divide_by == "active":
        denom = jnp.maximum(st.n_active.astype(s.dtype), 1.0)[:, None]
        return s / denom
    raise ValueError(divide_by)


def global_max_pool(st: SparseTensor) -> jax.Array:
    """[B, C] max over active rows (used by the point-cloud models)."""
    neg = jnp.asarray(-jnp.inf, st.feats.dtype)
    f = jnp.where(st.row_mask()[..., None], st.feats, neg)
    out = jnp.max(f, axis=1)
    return jnp.where(jnp.isfinite(out), out, 0)
