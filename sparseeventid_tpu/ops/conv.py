"""Sparse convolution application: gather + one dense GEMM.

TPU-native replacement for scn.SubmanifoldConvolution / scn.Convolution /
scn.Deconvolution (used in /root/reference/src/networks/sparse_building_blocks.py).

Given a rulebook (neighbor gather table, see rulebook.py), the convolution is

    out[b, n, :] = sum_k  W[k] @ feats[b, nbr[b, n, k], :]   (missing -> 0)

implemented as ONE gather to [B, N, K*Cin] followed by ONE matmul with
W.reshape(K*Cin, Cout).  With K=27 and Cin>=32 the contraction dimension is
>=864, which tiles well onto the 128x128 MXU — far better utilization than K
separate small GEMMs (the implicit-GEMM formulation, cf. TorchSparse++
arXiv:2311.12862, re-derived here for static-shape XLA).

Feature dtype policy: features may be bf16 while params stay f32; matmuls
request f32 accumulation via preferred_element_type.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .rulebook import Rulebook
from .sparse_tensor import SparseTensor


def gather_neighbors(feats: jax.Array, rb: Rulebook) -> jax.Array:
    """feats [B, N_in, C], rulebook [B, N_out, K] -> [B, N_out, K, C] (0 at miss)."""

    def one(f_b, idx_b, hit_b):
        g = jnp.take(f_b, idx_b, axis=0)  # [N_out, K, C]
        return jnp.where(hit_b[..., None], g, 0)

    return jax.vmap(one)(feats, rb.neighbor_idx, rb.hit)


def apply_conv(
    feats: jax.Array,  # [B, N_in, Cin]
    rb: Rulebook,
    w: jax.Array,  # [K, Cin, Cout]
    bias: jax.Array | None = None,  # [Cout]
    out_mask: jax.Array | None = None,  # bool[B, N_out] live-row mask
) -> jax.Array:
    """Core gather-GEMM. Returns [B, N_out, Cout]."""
    b, n_out, k = rb.neighbor_idx.shape
    cin = feats.shape[-1]
    cout = w.shape[-1]
    g = gather_neighbors(feats, rb).reshape(b, n_out, k * cin)
    out = jax.lax.dot_general(
        g,
        w.astype(g.dtype).reshape(k * cin, cout),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    if out_mask is not None:
        out = jnp.where(out_mask[..., None], out, 0)
    return out


def submanifold_conv(
    st: SparseTensor,
    rb: Rulebook,
    w: jax.Array,
    bias: jax.Array | None = None,
) -> SparseTensor:
    """scn.SubmanifoldConvolution: output sites == input sites."""
    out = apply_conv(st.feats, rb, w, bias, out_mask=st.row_mask())
    return st.with_feats(out)


def strided_conv(
    st_in: SparseTensor,
    skeleton: SparseTensor,
    rb: Rulebook,
    w: jax.Array,
    bias: jax.Array | None = None,
) -> SparseTensor:
    """scn.Convolution with filter_size == filter_stride (downsample).

    ``skeleton``/``rb`` come from rulebook.build_downsample(st_in, stride).
    """
    out = apply_conv(st_in.feats, rb, w, bias, out_mask=skeleton.row_mask())
    return skeleton.with_feats(out)


def deconv(
    st_coarse: SparseTensor,
    target: SparseTensor,
    rb: Rulebook,
    w: jax.Array,
    bias: jax.Array | None = None,
) -> SparseTensor:
    """scn.Deconvolution onto a supplied finer site set (see build_upsample)."""
    out = apply_conv(st_coarse.feats, rb, w, bias, out_mask=target.row_mask())
    return target.with_feats(out)


def average_pool(
    st_in: SparseTensor,
    skeleton: SparseTensor,
    rb: Rulebook,
    pool_size: Sequence[int],
) -> SparseTensor:
    """scn.AveragePooling (sparse_building_blocks.py:150-154): sum of child
    features divided by the FULL pool volume (scn divides by filter volume,
    not the live-child count)."""
    g = gather_neighbors(st_in.feats, rb)  # [B, Nout, K, C]
    vol = 1
    for p in pool_size:
        vol *= int(p)
    out = jnp.sum(g, axis=2) / jnp.asarray(vol, g.dtype)
    out = jnp.where(skeleton.row_mask()[..., None], out, 0)
    return skeleton.with_feats(out)
