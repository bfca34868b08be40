"""PointNet classifiers — capability parity with
/root/reference/src/networks/torch/pointnet.py (2D multiplane, shared plane
weights) and pointnet3d.py, masked-static-shape TPU style.

Architecture (pointnet.py:77-155): TNet(F) input transform -> shared MLP(64)
-> TNet(64) feature transform -> MLP(64,128,1024) -> max-pool over points ->
(2D: concat planes) -> per-label MLP heads.  TNet (pointnet.py:21-75):
MLP(64,128,1024) -> maxpool -> FC(512,256) -> k*k matrix + identity, with the
orthogonality penalty ||I - A A^T|| exposed for the loss.

TPU adaptations: point clouds are fixed-capacity [*, P, F] with a validity
mask; padded points are excluded from max-pools (-inf) and norm statistics
(masked); all matmuls batched for the MXU.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedPointBN(nn.Module):
    """BatchNorm over valid points of the whole batch."""

    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, train: bool) -> jax.Array:
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if train:
            m = mask[..., None].astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            xf = x.astype(jnp.float32)
            mean = jnp.sum(xf * m, axis=tuple(range(x.ndim - 1))) / cnt
            var = jnp.maximum(
                jnp.sum(xf * xf * m, axis=tuple(range(x.ndim - 1))) / cnt
                - mean**2,
                0.0,
            )
            if not self.is_initializing():
                mm = self.momentum
                ra_mean.value = mm * ra_mean.value + (1 - mm) * mean
                ra_var.value = mm * ra_var.value + (1 - mm) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        out = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return jnp.where(mask[..., None], out, 0).astype(x.dtype)


class PointMLP(nn.Module):
    """Shared per-point MLP (the Conv1d stack of reference MLP :5-19)."""

    features: Sequence[int]

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, train: bool) -> jax.Array:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"fc{i}")(x)
            x = MaskedPointBN(name=f"bn{i}")(x, mask, train)
            x = nn.relu(x)
        return jnp.where(mask[..., None], x, 0)


def masked_max(x: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    neg = jnp.asarray(-1e9, x.dtype)
    return jnp.max(jnp.where(mask[..., None], x, neg), axis=axis)


class TNet(nn.Module):
    """Spatial/feature transform net with orthogonality penalty
    (pointnet.py:21-75)."""

    k: int

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array, train: bool
    ) -> Tuple[jax.Array, jax.Array]:
        h = PointMLP((64, 128, 1024), name="mlp")(x, mask, train)
        pooled = masked_max(h, mask, axis=-2)  # [..., 1024]
        h = nn.relu(nn.Dense(512, name="fc1")(pooled))
        h = nn.relu(nn.Dense(256, name="fc2")(h))
        mat = nn.Dense(
            self.k * self.k,
            name="fc3",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(h)
        eye = jnp.eye(self.k, dtype=x.dtype).reshape(-1)
        mat = (mat + eye).reshape(*mat.shape[:-1], self.k, self.k)
        transformed = jnp.einsum("...pf,...fg->...pg", x, mat)
        transformed = jnp.where(mask[..., None], transformed, 0)
        # ||I - A A^T||^2 regularizer (pointnet.py:73)
        aat = jnp.einsum("...ij,...kj->...ik", mat, mat)
        ortho = jnp.sum((jnp.eye(self.k) - aat) ** 2, axis=(-2, -1))
        return transformed, jnp.mean(ortho)


class PointNetEncoder(nn.Module):
    """Per-cloud encoder -> [.., 1024] embedding + ortho penalty."""

    use_tnet: bool = True

    @nn.compact
    def __call__(self, pts, mask, train: bool):
        penalty = 0.0
        x = pts
        if self.use_tnet:
            x, p1 = TNet(pts.shape[-1], name="input_tnet")(x, mask, train)
            penalty = penalty + p1
        x = PointMLP((64, 64), name="mlp1")(x, mask, train)
        if self.use_tnet:
            x, p2 = TNet(64, name="feature_tnet")(x, mask, train)
            penalty = penalty + p2
        x = PointMLP((64, 128, 1024), name="mlp2")(x, mask, train)
        emb = masked_max(x, mask, axis=-2)
        return emb, penalty


class PointNetClassifier(nn.Module):
    """Multiplane (2D: [B, planes, P, F]) or single-cloud (3D: [B, P, F])
    PointNet with per-label heads; plane weights shared via vmap-free
    broadcasting (the reference shares modules across plane loops,
    pointnet.py:96-126)."""

    output_shape: Mapping[str, int]
    use_tnet: bool = True
    head_hidden: int = 256
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self, pts: jax.Array, mask: jax.Array, train: bool = True
    ) -> Dict[str, jax.Array]:
        multiplane = pts.ndim == 4
        emb, penalty = PointNetEncoder(self.use_tnet, name="encoder")(
            pts, mask, train
        )
        if multiplane:  # [B, planes, 1024] -> concat
            emb = emb.reshape(emb.shape[0], -1)
        self.sow("losses", "tnet_ortho", penalty)
        out = {}
        for key, n in self.output_shape.items():
            h = nn.relu(nn.Dense(512, name=f"{key}_fc1")(emb))
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = nn.relu(nn.Dense(self.head_hidden, name=f"{key}_fc2")(h))
            out[key] = nn.Dense(n, name=f"{key}_out")(h)
        return out
