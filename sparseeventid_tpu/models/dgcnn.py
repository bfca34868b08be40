"""Dynamic Graph CNN — capability parity with
/root/reference/src/networks/torch/dgcnn2d.py:79-178 and dgcnn3d.py, TPU-native.

Per layer: kNN graph over current features (pairwise distances + top-k,
dgcnn2d.py:34-48), edge features (x_j - x_i, x_i) (:50-75), shared MLP,
max over neighbors.  Four edge-conv stages (64, 64, 128, 256), concat ->
1024-d embedding, global max+avg pool concat, per-label heads.

TPU notes: the kNN is an [..., P, P] distance matrix + lax.top_k — batched
dense compute that maps straight onto MXU/VPU (no torch cdist / CUDA
device pinning like dgcnn3d.py:49).  Padded points are pushed to +inf
distance so they are never selected, and excluded from pools.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .pointnet import MaskedPointBN, masked_max


def knn_indices(x: jax.Array, mask: jax.Array, k: int) -> jax.Array:
    """[..., P, F] -> neighbor indices [..., P, k] among valid points."""
    # squared euclidean distances
    sq = jnp.sum(x * x, axis=-1)
    d = (
        sq[..., :, None]
        - 2.0 * jnp.einsum("...pf,...qf->...pq", x, x)
        + sq[..., None, :]
    )
    big = jnp.asarray(1e9, d.dtype)
    d = jnp.where(mask[..., None, :], d, big)  # invalid neighbors far away
    # exclude self? reference includes self in topk of -dist; keep parity
    _, idx = jax.lax.top_k(-d, k)
    return idx


def edge_features(x: jax.Array, idx: jax.Array) -> jax.Array:
    """(x_j - x_i, x_i) edge features [..., P, k, 2F] (dgcnn2d.py:50-75)."""
    gathered = jnp.take_along_axis(
        x[..., None, :, :],  # [..., 1, P, F]
        idx[..., None],  # [..., P, k, 1]
        axis=-2,
    )  # [..., P, k, F]
    xi = jnp.broadcast_to(x[..., :, None, :], gathered.shape)
    return jnp.concatenate([gathered - xi, xi], axis=-1)


class EdgeConv(nn.Module):
    n_out: int
    k: int

    @nn.compact
    def __call__(self, x, mask, train: bool):
        idx = knn_indices(x, mask, self.k)
        e = edge_features(x, idx)  # [..., P, k, 2F]
        h = nn.Dense(self.n_out, use_bias=False, name="fc")(e)
        # norm over valid points (broadcast mask over k)
        flat_mask = jnp.broadcast_to(mask[..., None], h.shape[:-1])
        h = MaskedPointBN(name="bn")(
            h.reshape(*h.shape[:-3], -1, self.n_out),
            flat_mask.reshape(*h.shape[:-3], -1),
            train,
        ).reshape(h.shape)
        h = nn.leaky_relu(h, negative_slope=0.2)  # dgcnn default slope
        out = jnp.max(h, axis=-2)  # max over k neighbors
        return jnp.where(mask[..., None], out, 0)


class DGCNNClassifier(nn.Module):
    """[B, P, F] (3D) or [B, planes, P, F] (2D multiplane, shared weights)."""

    output_shape: Mapping[str, int]
    k: int = 20
    emb_dims: int = 1024
    stage_dims: Sequence[int] = (64, 64, 128, 256)
    head_hidden: int = 256
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self, pts: jax.Array, mask: jax.Array, train: bool = True
    ) -> Dict[str, jax.Array]:
        multiplane = pts.ndim == 4
        x = pts
        stages = []
        for i, f in enumerate(self.stage_dims):
            x = EdgeConv(f, self.k, name=f"edge{i}")(x, mask, train)
            stages.append(x)
        h = jnp.concatenate(stages, axis=-1)
        h = nn.Dense(self.emb_dims, use_bias=False, name="emb")(h)
        h = MaskedPointBN(name="emb_bn")(h, mask, train)
        h = nn.leaky_relu(h, negative_slope=0.2)
        gmax = masked_max(h, mask, axis=-2)
        m = mask[..., None].astype(h.dtype)
        gavg = jnp.sum(h * m, axis=-2) / jnp.maximum(
            jnp.sum(m, axis=-2), 1.0
        )
        emb = jnp.concatenate([gmax, gavg], axis=-1)
        if multiplane:
            emb = emb.reshape(emb.shape[0], -1)
        out = {}
        for key, n in self.output_shape.items():
            h2 = nn.leaky_relu(
                nn.Dense(512, name=f"{key}_fc1")(emb), negative_slope=0.2
            )
            h2 = nn.Dropout(self.dropout, deterministic=not train)(h2)
            h2 = nn.leaky_relu(
                nn.Dense(self.head_hidden, name=f"{key}_fc2")(h2),
                negative_slope=0.2,
            )
            out[key] = nn.Dense(n, name=f"{key}_out")(h2)
        return out
