"""Dense-mode ResNet encoder — capability parity with
/root/reference/src/networks/building_blocks.py + resnet.py dense branch
(which is dead code upstream due to a syntax error at building_blocks.py:65;
implemented working here), using XLA:TPU native convolutions, channels-last.

Same macro-architecture as the sparse encoder: initial 5^d conv, depth x
[BlockSeries + stride-2 downsample, filters grow], final series, 1x1
bottleneck, global average pool boundary, tanh.  2D multiplane shares plane
weights by folding the plane axis into the batch (equivalent to the
reference's per-plane shared-module loop, torch/resnet.py:279-287).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config.schema import ConvRepresentation, DownSampling, GrowthRate, Norm


def _norm(norm: Norm, name: str):
    if norm == Norm.batch:
        return nn.BatchNorm(
            use_running_average=None, momentum=0.9, epsilon=1e-4, name=name
        )
    if norm in (Norm.group, Norm.layer):
        return nn.GroupNorm(num_groups=1, name=name)
    return None


class DenseBlock(nn.Module):
    n_out: int
    params: ConvRepresentation
    kernel: Tuple[int, ...]
    activate: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.n_out, self.kernel, use_bias=self.params.bias, name="conv"
        )(x)
        norm = _norm(self.params.normalization, "norm")
        if norm is not None:
            x = norm(x, use_running_average=not train) if isinstance(
                norm, nn.BatchNorm
            ) else norm(x)
        if self.activate:
            x = nn.leaky_relu(x, negative_slope=self.params.leakiness)
        return x


class DenseResidualBlock(nn.Module):
    n_out: int
    params: ConvRepresentation
    kernel: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, train: bool):
        res = x
        h = DenseBlock(self.n_out, self.params, self.kernel, name="conv1")(
            x, train
        )
        h = DenseBlock(
            self.n_out, self.params, self.kernel, activate=False, name="conv2"
        )(h, train)
        return nn.leaky_relu(h + res, negative_slope=self.params.leakiness)


class DenseEncoder(nn.Module):
    """[B, *spatial, C] -> [B, n_output_filters] pooled + tanh'd encoding."""

    params: ConvRepresentation
    dimension: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        p = self.params
        d = x.ndim - 2  # spatial rank (planes already folded into batch)
        kernel5 = (5,) * d
        kernel = (p.filter_size,) * d
        stride = (2,) * d
        x = nn.Conv(p.n_initial_filters, kernel5, use_bias=p.bias, name="initial")(x)
        filters = p.n_initial_filters
        for i in range(p.depth):
            for b in range(p.blocks_per_layer):
                if p.residual:
                    x = DenseResidualBlock(
                        filters, p, kernel, name=f"series_{i}_block_{b}"
                    )(x, train)
                else:
                    x = DenseBlock(
                        filters, p, kernel, name=f"series_{i}_block_{b}"
                    )(x, train)
            next_filters = (
                filters * 2
                if p.growth_rate == GrowthRate.multiplicative
                else filters + p.n_initial_filters
            )
            if p.downsampling == DownSampling.convolutional:
                x = nn.Conv(
                    next_filters, stride, strides=stride, use_bias=False,
                    name=f"down_{i}",
                )(x)
            else:
                x = nn.max_pool(x, stride, strides=stride)
                x = nn.Conv(
                    next_filters, (1,) * d, use_bias=p.bias, name=f"down_{i}"
                )(x)
            norm = _norm(p.normalization, f"down_norm_{i}")
            if norm is not None:
                x = norm(x, use_running_average=not train) if isinstance(
                    norm, nn.BatchNorm
                ) else norm(x)
            x = nn.leaky_relu(x, negative_slope=p.leakiness)
            filters = next_filters
        for b in range(p.blocks_per_layer):
            if p.residual:
                x = DenseResidualBlock(
                    filters, p, kernel, name=f"final_block_{b}"
                )(x, train)
            else:
                x = DenseBlock(filters, p, kernel, name=f"final_block_{b}")(
                    x, train
                )
        x = nn.Conv(p.n_output_filters, (1,) * d, use_bias=p.bias, name="bottleneck")(x)
        x = jnp.tanh(x)
        # AvgPool over the full remaining spatial extent (head contract)
        return jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))


class DenseEventClassifier(nn.Module):
    """Dense-mode flagship: encoder + per-label heads.

    Input: [B, *spatial, 1] (3D) or [B, planes, H, W, 1] (2D multiplane —
    planes folded into batch for shared weights, features concatenated)."""

    encoder_cfg: ConvRepresentation
    output_shape: Mapping[str, int]
    dimension: int
    head_hidden: int = 256
    head_dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> Dict[str, jax.Array]:
        if self.dimension == 2 and x.ndim == 5:
            b, planes = x.shape[0], x.shape[1]
            x = x.reshape(b * planes, *x.shape[2:])
            pooled = DenseEncoder(self.encoder_cfg, 2, name="encoder")(x, train)
            pooled = pooled.reshape(b, -1)  # concat planes
        else:
            pooled = DenseEncoder(self.encoder_cfg, self.dimension, name="encoder")(
                x, train
            )
        out = {}
        for key, n in self.output_shape.items():
            h = nn.Dense(self.head_hidden, name=f"{key}_fc1")(pooled)
            h = nn.Dropout(self.head_dropout, deterministic=not train)(h)
            h = nn.leaky_relu(h, negative_slope=0.01)
            out[key] = nn.Dense(n, name=f"{key}_fc2")(h)
        return out
