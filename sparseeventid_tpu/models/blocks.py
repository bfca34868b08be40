"""Sparse network building blocks (flax) — capability parity with
/root/reference/src/networks/sparse_building_blocks.py, built on the
TPU-native ops core instead of scn.

Key structural difference from the torch version: rulebooks are explicit.
A submanifold BlockSeries shares ONE rulebook for all its convs (SCN caches
this in C++ metadata; here the reuse is visible and jit-friendly).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config.schema import ConvRepresentation, DownSampling, Norm
from ..ops import (
    Rulebook,
    SparseTensor,
    apply_norm,
    average_pool,
    build_downsample,
    build_submanifold_rulebook,
    build_upsample,
    deconv,
    masked_batch_stats,
    masked_group_norm,
    strided_conv,
    submanifold_conv,
)
from ..ops.engine import (
    apply_strided,
    apply_submanifold,
    apply_upsample,
    build_downsample_plan,
    build_upsample_plan,
    plan_overflow_dropped,
)

# He-style init over the (K, Cin) receptive field, the standard for
# conv-with-untied-offset-weights layouts.
conv_init = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")


class MaskedBatchNorm(nn.Module):
    """Batch norm over active voxels only (scn.BatchNormalization semantics,
    eps/momentum matching scn defaults)."""

    momentum: float = 0.9
    eps: float = 1e-4
    axis_name: str | None = None

    @nn.compact
    def __call__(self, feats: jax.Array, mask: jax.Array, train: bool) -> jax.Array:
        c = feats.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if train:
            mean, var = masked_batch_stats(feats, mask, self.axis_name)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        return apply_norm(feats, mask, mean, var, scale, bias, self.eps)


class MaskedGroupNorm(nn.Module):
    """scn.SparseGroupNorm(num_groups=1) equivalent."""

    num_groups: int = 1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, feats: jax.Array, mask: jax.Array, train: bool = True):
        c = feats.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return masked_group_norm(feats, mask, self.num_groups, scale, bias, self.eps)


def _make_norm(norm: Norm, name: str, axis_name: str | None = None):
    if norm == Norm.batch:
        return MaskedBatchNorm(name=name, axis_name=axis_name)
    if norm in (Norm.group, Norm.layer):
        return MaskedGroupNorm(name=name)
    return None


class InputNorm(nn.Module):
    """Reference InputNorm = SparseGroupNorm(1, C) on the raw input
    (sparse_building_blocks.py:7-16)."""

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = True) -> SparseTensor:
        out = MaskedGroupNorm(name="norm")(st.feats, st.row_mask(), train)
        return st.with_feats(out)


class SparseBlock(nn.Module):
    """Submanifold conv + norm + activation (reference Block :18-57)."""

    n_out: int
    params: ConvRepresentation
    activate: bool = True
    axis_name: str | None = None

    @nn.compact
    def __call__(self, st: SparseTensor, rb, train: bool) -> SparseTensor:
        k = rb.num_offsets
        c_in = st.num_channels
        w = self.param("w", conv_init, (k, c_in, self.n_out))
        b = (
            self.param("b", nn.initializers.zeros, (self.n_out,))
            if self.params.bias
            else None
        )
        out = apply_submanifold(st, rb, w, b)
        norm = _make_norm(self.params.normalization, "norm", self.axis_name)
        if norm is not None:
            out = out.with_feats(norm(out.feats, out.row_mask(), train))
        if self.activate:
            out = out.with_feats(
                nn.leaky_relu(out.feats, negative_slope=self.params.leakiness)
            )
        return out


class SparseResidualBlock(nn.Module):
    """conv-norm-act, conv-norm, +residual, act (reference ResidualBlock :61-100)."""

    n_out: int
    params: ConvRepresentation
    axis_name: str | None = None

    @nn.compact
    def __call__(self, st: SparseTensor, rb: Rulebook, train: bool) -> SparseTensor:
        residual = st.feats
        out = SparseBlock(
            self.n_out, self.params, activate=True, axis_name=self.axis_name,
            name="conv1",
        )(st, rb, train)
        out = SparseBlock(
            self.n_out, self.params, activate=False, axis_name=self.axis_name,
            name="conv2",
        )(out, rb, train)
        summed = out.feats + residual
        return out.with_feats(
            nn.leaky_relu(summed, negative_slope=self.params.leakiness)
        )


class SparseBlockSeries(nn.Module):
    """n_blocks (residual) blocks sharing one rulebook (reference BlockSeries
    :231-264). The rulebook is built once per site set by the caller."""

    n_blocks: int
    params: ConvRepresentation
    axis_name: str | None = None

    @nn.compact
    def __call__(self, st: SparseTensor, rb: Rulebook, train: bool) -> SparseTensor:
        for i in range(self.n_blocks):
            if self.params.residual:
                st = SparseResidualBlock(
                    st.num_channels, self.params, axis_name=self.axis_name,
                    name=f"block_{i}",
                )(st, rb, train)
            else:
                st = SparseBlock(
                    st.num_channels, self.params, axis_name=self.axis_name,
                    name=f"block_{i}",
                )(st, rb, train)
        return st


class ConvolutionDownsample(nn.Module):
    """Strided conv (filter=stride) + norm + act (reference :103-139).
    Builds the new site set; `out_capacity` implements the static
    voxel-capacity schedule (SURVEY.md §7.4 item 1)."""

    n_out: int
    stride: Tuple[int, ...]
    params: ConvRepresentation
    out_capacity: int | None = None
    axis_name: str | None = None
    backend: str = "xla"
    q_bound_frac_in: float = 1.0
    q_bound_frac_out: float = 1.0

    @nn.compact
    def __call__(
        self, st: SparseTensor, train: bool, precomputed=None
    ) -> SparseTensor:
        if precomputed is not None:
            # host-built site set + (fwd, rev) plans; site_dropped is sowed
            # once by the encoder from the host totals
            skeleton, plan = precomputed
            self.sow(
                "diagnostics", "dropped", plan_overflow_dropped(plan),
                reduce_fn=lambda a, b: a + b,
                init_fn=lambda: jnp.zeros((), jnp.int32),
            )
        else:
            skeleton, plan, ds_dropped = build_downsample_plan(
                st, self.stride, self.out_capacity, backend=self.backend,
                q_bound_frac_in=self.q_bound_frac_in,
                q_bound_frac_out=self.q_bound_frac_out,
            )
            self.sow(
                "diagnostics", "dropped",
                jnp.sum(ds_dropped) + plan_overflow_dropped(plan),
                reduce_fn=lambda a, b: a + b,
                init_fn=lambda: jnp.zeros((), jnp.int32),
            )
        k = 1
        for sdim in self.stride:
            k *= int(sdim)
        w = self.param("w", conv_init, (k, st.num_channels, self.n_out))
        out = apply_strided(st, skeleton, plan, w)  # reference bias=False
        norm = _make_norm(self.params.normalization, "norm", self.axis_name)
        if norm is not None:
            out = out.with_feats(norm(out.feats, out.row_mask(), train))
        return out.with_feats(
            nn.leaky_relu(out.feats, negative_slope=self.params.leakiness)
        )


class PoolingDownsample(nn.Module):
    """AveragePooling + 1x1 filter update (reference Pooling :142-168,
    implemented working — the reference version has a broken kwarg).

    Fast path: average pooling divides by the FULL pool volume V (scn
    semantics, ops/conv.average_pool), so pool + 1x1 conv is algebraically
    a strided conv with weights tied across offsets:

        out[j] = (sum_k x[child_k(j)] / V) @ w  =  sum_k x @ (w / V)

    i.e. ``apply_strided`` with ``W[k] = w/V`` for every k — the SAME
    window kernels + host plans as ConvolutionDownsample, no new kernel.
    The gradient to the shared ``w`` sums over k automatically through the
    broadcast.  The XLA gather path remains for precomputed=None +
    backend='xla' (tests, CPU)."""

    n_out: int
    stride: Tuple[int, ...]
    params: ConvRepresentation
    out_capacity: int | None = None
    axis_name: str | None = None
    backend: str = "xla"
    q_bound_frac_in: float = 1.0
    q_bound_frac_out: float = 1.0

    @nn.compact
    def __call__(
        self, st: SparseTensor, train: bool, precomputed=None
    ) -> SparseTensor:
        k = 1
        for sdim in self.stride:
            k *= int(sdim)
        w = self.param("w", conv_init, (1, st.num_channels, self.n_out))
        b = (
            self.param("b", nn.initializers.zeros, (self.n_out,))
            if self.params.bias
            else None
        )
        if precomputed is not None or self.backend == "window":
            # tied-weight strided conv on the window engine (host plans or
            # device-built plans)
            if precomputed is not None:
                skeleton, plan = precomputed
                dropped = plan_overflow_dropped(plan)
            else:
                skeleton, plan, ds_dropped = build_downsample_plan(
                    st, self.stride, self.out_capacity, backend=self.backend,
                    q_bound_frac_in=self.q_bound_frac_in,
                    q_bound_frac_out=self.q_bound_frac_out,
                )
                dropped = jnp.sum(ds_dropped) + plan_overflow_dropped(plan)
            self.sow(
                "diagnostics", "dropped", dropped,
                reduce_fn=lambda a, b: a + b,
                init_fn=lambda: jnp.zeros((), jnp.int32),
            )
            wk = jnp.broadcast_to(w[0] / k, (k, *w.shape[1:]))
            out = apply_strided(st, skeleton, plan, wk)
            out_feats = out.feats
        else:
            skeleton, rb, ds_dropped = build_downsample_plan(
                st, self.stride, self.out_capacity, backend="xla"
            )
            self.sow(
                "diagnostics", "dropped", jnp.sum(ds_dropped),
                reduce_fn=lambda a, b: a + b,
                init_fn=lambda: jnp.zeros((), jnp.int32),
            )
            pooled = average_pool(st, skeleton, rb, self.stride)
            out = pooled
            out_feats = jnp.einsum("bnc,co->bno", pooled.feats, w[0])
        if b is not None:
            out_feats = out_feats + b
        out = out.with_feats(
            jnp.where(out.row_mask()[..., None], out_feats, 0)
        )
        norm = _make_norm(self.params.normalization, "norm", self.axis_name)
        if norm is not None:
            out = out.with_feats(norm(out.feats, out.row_mask(), train))
        return out.with_feats(
            nn.leaky_relu(out.feats, negative_slope=self.params.leakiness)
        )


class ConvolutionUpsample(nn.Module):
    """scn.Deconvolution onto a supplied target site set (reference :202-229,
    with the norm-flag bug fixed).  backend='window' rides the strided
    window kernels transposed (ops/engine.build_upsample_plan); the XLA
    rulebook remains the reference path."""

    n_out: int
    stride: Tuple[int, ...]
    params: ConvRepresentation
    axis_name: str | None = None
    backend: str = "xla"

    @nn.compact
    def __call__(
        self, st: SparseTensor, target: SparseTensor, train: bool,
        precomputed=None,
    ) -> SparseTensor:
        k = 1
        for sdim in self.stride:
            k *= int(sdim)
        w = self.param("w", conv_init, (k, st.num_channels, self.n_out))
        b = (
            self.param("b", nn.initializers.zeros, (self.n_out,))
            if self.params.bias
            else None
        )
        plan = (
            precomputed
            if precomputed is not None
            else build_upsample_plan(st, target, self.stride, self.backend)
        )
        dropped = plan_overflow_dropped(plan)
        self.sow(
            "diagnostics", "dropped", dropped,
            reduce_fn=lambda a, b: a + b,
            init_fn=lambda: jnp.zeros((), jnp.int32),
        )
        out = apply_upsample(st, target, plan, w, b)
        norm = _make_norm(self.params.normalization, "norm", self.axis_name)
        if norm is not None:
            out = out.with_feats(norm(out.feats, out.row_mask(), train))
        return out.with_feats(
            nn.leaky_relu(out.feats, negative_slope=self.params.leakiness)
        )
