"""Masked normalizations over active voxels only — TPU-native equivalents of
scn.BatchNormalization / scn.SparseGroupNorm (used at
/root/reference/src/networks/sparse_building_blocks.py:37-44,118-122).

SCN computes statistics over the *active sites* of the whole minibatch (the
nnz rows), never over padding — matching that exactly is what makes accuracy
transfer (SURVEY.md §7.4 item 5).  These are pure functions; stateful running
averages live in the flax modules (models/blocks.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def masked_batch_stats(
    feats: jax.Array,  # [B, N, C]
    mask: jax.Array,  # bool[B, N]
    axis_name: str | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """(mean, var) per channel over active rows of the whole batch.

    If ``axis_name`` is given the statistics are additionally psum-reduced over
    that mesh axis (cross-replica sync batch norm over ICI).
    """
    m = mask[..., None].astype(jnp.float32)
    f = feats.astype(jnp.float32)
    count = jnp.sum(m)
    s1 = jnp.sum(f * m, axis=(0, 1))
    s2 = jnp.sum(f * f * m, axis=(0, 1))
    if axis_name is not None:
        count = jax.lax.psum(count, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
    count = jnp.maximum(count, 1.0)
    mean = s1 / count
    var = jnp.maximum(s2 / count - mean * mean, 0.0)
    return mean, var


def apply_norm(
    feats: jax.Array,
    mask: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    scale: jax.Array | None,
    offset: jax.Array | None,
    eps: float = 1e-4,
) -> jax.Array:
    inv = jax.lax.rsqrt(var + eps)
    out = (feats.astype(jnp.float32) - mean) * inv
    if scale is not None:
        out = out * scale
    if offset is not None:
        out = out + offset
    out = jnp.where(mask[..., None], out, 0.0)
    return out.astype(feats.dtype)


def masked_group_norm(
    feats: jax.Array,  # [B, N, C]
    mask: jax.Array,  # bool[B, N]
    num_groups: int,
    scale: jax.Array | None,
    offset: jax.Array | None,
    eps: float = 1e-5,
) -> jax.Array:
    """scn.SparseGroupNorm: per-sample, per-group statistics over active rows.

    The reference always uses num_groups=1 (instance/layer-style norm over all
    channels of one event, sparse_building_blocks.py:12,42).
    """
    b, n, c = feats.shape
    g = num_groups
    f = feats.astype(jnp.float32).reshape(b, n, g, c // g)
    m = mask[:, :, None, None].astype(jnp.float32)
    count = jnp.maximum(jnp.sum(m, axis=(1, 3)) * (c // g), 1.0)  # [B, G]
    mean = jnp.sum(f * m, axis=(1, 3)) / count
    var = jnp.maximum(
        jnp.sum(f * f * m, axis=(1, 3)) / count - mean * mean, 0.0
    )
    inv = jax.lax.rsqrt(var + eps)  # [B, G]
    out = (f - mean[:, None, :, None]) * inv[:, None, :, None]
    out = out.reshape(b, n, c)
    if scale is not None:
        out = out * scale
    if offset is not None:
        out = out + offset
    out = jnp.where(mask[..., None], out, 0.0)
    return out.astype(feats.dtype)
