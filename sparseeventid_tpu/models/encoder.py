"""Sparse ResNet encoder — capability parity with
/root/reference/src/networks/resnet.py (Encoder), TPU-native.

Structure (resnet.py:12-139):
  initial 5^d submanifold conv 1 -> n_initial_filters
  depth x [ BlockSeries(blocks_per_layer) ; downsample x2, filters grow ]
  final BlockSeries
  1x1 bottleneck -> n_output_filters
  (SparseToDense + tanh happen at the pooling boundary; here the encoder
   returns the final SparseTensor with tanh applied — tanh(0)=0 so masked
   global pooling matches dense AvgPool exactly.)

2D multiplane trick (resnet.py:26-36): 2D data is a 3D grid with the plane
index as coordinate 0 and kernels [1, k, k] — plane-shared weights with no
cross-plane mixing, identical semantics here via per-dim kernel sizes.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config.schema import (
    ConvRepresentation,
    DownSampling,
    GrowthRate,
    SparseEventIDConfig,
)
from ..ops import SparseTensor, build_submanifold_rulebook, submanifold_conv
from ..ops.engine import (
    apply_submanifold,
    build_series_plan,
    plan_overflow_dropped,
)
from ..ops.pallas.window_conv import window_r_for_level, window_r_initial
from .blocks import (
    ConvolutionDownsample,
    PoolingDownsample,
    SparseBlockSeries,
    conv_init,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Window-kernel grid quantum: TILE_T (128) query rows per tile, up to
# TILES_PER_STEP (4) tiles per grid step (ops/pallas/window_conv.py).
# Capacities that are multiples of this make every [B, cap, *] tensor land
# exactly on the kernels' padded query/output shapes — the per-conv qkeys
# pad (an 86 MB HBM round-trip at dune3d scale) and output slice vanish.
GRID_QUANTUM = 512


def capacity_schedule(
    n0: int, depth: int, shrink: float, min_capacity: int
) -> Tuple[int, ...]:
    """Static per-level COO capacities. Sparse track-like events lose roughly
    half their active voxels per 2x downsample; capping capacity per level
    keeps every gather/GEMM small at deep levels (the reference has no
    analog — scn reallocates dynamically, which XLA cannot).  All values are
    GRID_QUANTUM multiples (see above)."""
    caps = [_round_up(n0, GRID_QUANTUM)]
    c = n0
    for _ in range(depth):
        c = max(min_capacity, int(c * shrink))
        caps.append(min(_round_up(c, GRID_QUANTUM), caps[-1]))
    return tuple(caps)


class Encoder(nn.Module):
    """Returns the encoded SparseTensor (n_output_filters channels, spatial
    reduced by 2**depth) with tanh applied."""

    params: ConvRepresentation
    dimension: int  # 2 => plane-axis grid with [1,k,k] kernels
    capacities: Tuple[int, ...] = ()
    axis_name: str | None = None
    remat: bool = False  # jax.checkpoint each block series (HBM for FLOPs)
    backend: str = "xla"  # sparse conv engine (ops/engine.py)

    def _kernel(self, k: int, level: int = 0) -> Tuple[int, ...]:
        if self.dimension == 2:
            # legacy multiplane post-merge: cross-plane [3,k,k] kernels from
            # plane_merge_depth onward (sparseresnet.py:194-334); [1,k,k]
            # keeps plane-shared weights with no cross-plane mixing
            pm = self.params.plane_merge_depth
            if pm >= 0 and level >= pm:
                return (3, k, k)
            return (1, k, k)
        return (k,) * self.dimension

    def _stride(self) -> Tuple[int, ...]:
        if self.dimension == 2:
            return (1, 2, 2)
        return (2,) * self.dimension

    def _qb_frac(self, level: int) -> float:
        p = self.params
        f = getattr(p, "query_bound_frac", 1.0)
        g = getattr(p, "query_bound_growth", 1.6)
        return min(1.0, f * g**level)

    def _sow_overflow(self, plan):
        # Surface window-plan overflow drops as a train metric (never let
        # the exact-sidecar cap corrupt accuracy silently).
        self.sow(
            "diagnostics", "dropped", plan_overflow_dropped(plan),
            reduce_fn=lambda a, b: a + b,
            init_fn=lambda: jnp.zeros((), jnp.int32),
        )

    @nn.compact
    def __call__(
        self, st: SparseTensor, train: bool = True, plans=None
    ) -> SparseTensor:
        """plans: optional ops.host_plans.EncoderPlans — precomputed by the
        C++ prefetch workers; when given, no plan construction runs on
        device (production hot path)."""
        p = self.params
        caps = self.capacities or (None,) * (p.depth + 1)

        # Initial 5^d submanifold convolution (resnet.py:30-50)
        k5 = 1
        for kk in self._kernel(5, 0):
            k5 *= kk
        if plans is not None:
            rb = plans.initial
            self.sow(
                "diagnostics", "dropped", plans.site_dropped,
                reduce_fn=lambda a, b: a + b,
                init_fn=lambda: jnp.zeros((), jnp.int32),
            )
        else:
            rb = build_series_plan(
                st, self._kernel(5, 0), backend=self.backend,
                q_bound_frac=self._qb_frac(0),
                window_r=window_r_initial(),
            )
        self._sow_overflow(rb)
        w0 = self.param(
            "initial_w", conv_init, (k5, st.num_channels, p.n_initial_filters)
        )
        b0 = (
            self.param("initial_b", nn.initializers.zeros, (p.n_initial_filters,))
            if p.bias
            else None
        )
        st = apply_submanifold(st, rb, w0, b0)

        filters = p.n_initial_filters
        downsampler = (
            ConvolutionDownsample
            if p.downsampling == DownSampling.convolutional
            else PoolingDownsample
        )
        series_cls = (
            nn.remat(SparseBlockSeries, static_argnums=(3,))
            if self.remat
            else SparseBlockSeries
        )
        for i in range(p.depth):
            if plans is not None:
                rb = plans.series[i]
            else:
                rb = build_series_plan(
                    st, self._kernel(p.filter_size, i), backend=self.backend,
                    q_bound_frac=self._qb_frac(i),
                    window_r=window_r_for_level(i),
                )
            self._sow_overflow(rb)
            st = series_cls(
                p.blocks_per_layer, p, axis_name=self.axis_name, name=f"series_{i}"
            )(st, rb, train)
            if p.growth_rate == GrowthRate.multiplicative:
                next_filters = filters * 2
            else:
                next_filters = filters + p.n_initial_filters
            precomputed = (
                (plans.skeletons[i], plans.down[i]) if plans is not None else None
            )
            st = downsampler(
                next_filters,
                self._stride(),
                p,
                out_capacity=caps[i + 1],
                axis_name=self.axis_name,
                backend=self.backend,
                q_bound_frac_in=self._qb_frac(i),
                q_bound_frac_out=self._qb_frac(i + 1),
                name=f"down_{i}",
            )(st, train, precomputed)
            filters = next_filters

        if plans is not None:
            rb = plans.series[p.depth]
        else:
            rb = build_series_plan(
                st, self._kernel(p.filter_size, p.depth), backend=self.backend,
                q_bound_frac=self._qb_frac(p.depth),
                window_r=window_r_for_level(p.depth),
            )
        self._sow_overflow(rb)
        st = series_cls(
            p.blocks_per_layer, p, axis_name=self.axis_name, name="final_series"
        )(st, rb, train)

        # 1x1 bottleneck (resnet.py:105-110): pointwise, no rulebook needed
        wb = self.param("bottleneck_w", conv_init, (1, filters, p.n_output_filters))
        bb = (
            self.param("bottleneck_b", nn.initializers.zeros, (p.n_output_filters,))
            if p.bias
            else None
        )
        feats = jnp.einsum("bnc,co->bno", st.feats, wb[0])
        if bb is not None:
            feats = feats + bb
        feats = jnp.where(st.row_mask()[..., None], feats, 0)
        st = st.with_feats(feats)

        # Final activation (resnet.py:159): tanh; tanh(0)=0 keeps padding inert.
        return st.with_feats(jnp.tanh(st.feats))


def encoder_output_shape(
    cfg_encoder: ConvRepresentation, image_shape: Tuple[int, ...], dimension: int
) -> Tuple[int, ...]:
    """[C, *spatial/2**depth] (resnet.py:114-119)."""
    if dimension == 2:
        spatial = [image_shape[0]] + [
            s // 2**cfg_encoder.depth for s in image_shape[1:]
        ]
    else:
        spatial = [s // 2**cfg_encoder.depth for s in image_shape]
    return tuple([cfg_encoder.n_output_filters] + spatial)
