"""Backend dispatch for the sparse conv engine.

Two numerically interchangeable backends:
  * 'xla'    — searchsorted rulebooks + XLA dynamic gathers (reference
               implementation; exact; runs anywhere; slow on TPU).
  * 'window' — sorted-window implicit-GEMM Pallas kernels (primary TPU
               path; exact via the anchor/overflow construction; runs in
               interpret mode on CPU).

Models call these functions with an opaque ``plan`` object whose type
selects the backend.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax

from .conv import deconv, strided_conv, submanifold_conv
from .rulebook import (
    Rulebook,
    build_downsample_rulebook,
    build_submanifold_rulebook,
    build_upsample,
    downsample_sites,
)
from .sparse_tensor import SparseTensor
from .pallas.window_engine import (
    WindowPlan,
    build_strided_window_plans,
    build_submanifold_window_plan,
    window_deconv,
    window_strided_conv,
    window_submanifold_conv,
)

XLA = "xla"
WINDOW = "window"


def _interpret() -> bool:
    # Pallas compiles only on TPU; interpret elsewhere (tests, CPU dryruns).
    return jax.default_backend() != "tpu"


def query_bound(capacity: int, frac: float | None) -> int | None:
    """Static query-row bound for the window kernels: a fraction of the
    level capacity, rounded up to a whole grid step (TILE_T*TILES_PER_STEP).
    None (frac>=1) keeps the full capacity.  Tiles past the bound skip the
    kernel grid entirely; plan_overflow_dropped surfaces any excess of
    n_active over the bound so a misconfigured fraction is never silent."""
    if frac is None or frac >= 1.0:
        return None
    from .pallas.window_conv import TILE_T, TUNING

    step = TILE_T * TUNING.p_series
    b = max(int(capacity * frac), step)
    b = ((b + step - 1) // step) * step
    return None if b >= capacity else b


def _overflow_cap(capacity: int, k: int = 27) -> int:
    """Overflow sidecar capacity, scaled to the level's voxel capacity AND
    to the offset count: candidates are dominated by queries whose anchor
    block escaped the plan window, a per-(tile, offset) tail — a 5^3 kernel
    (K=125) produces ~5x the candidates of a 3^3 one (K=27).  Measured on
    dune3d-shaped tracks (scripts/check_window_tpu.py): K=27 fits in
    capacity//16; K=125 overflowed a 1562 cap by ~2.4x.

    capacity//6 (not //16): the sidecar fori_loops are bounded by the
    DYNAMIC entry count (window_conv._ov_bound), so cap headroom is free at
    runtime — and the extra margin is what lets WINDOW_R drop to one MXU
    pass per offset (R=128) with out-of-window pairs spilling here.
    Sized for full dune3d occupancy (26-42k active): //8 with a 12288
    ceiling dropped pairs on the lvl0 strided-down plan (1333/batch) and
    clamped the initial 5^3 plan (r3 e2e attribution)."""
    scale = max(1, -(-k // 27))
    return max(256, min(16384, (capacity // 6) * scale))


def build_series_plan(st: SparseTensor, kernel_size, backend: str = XLA,
                      q_bound_frac: float = 1.0,
                      window_r: int | None = None):
    if backend == WINDOW:
        k = 1
        for ks in kernel_size:
            k *= int(ks)
        return build_submanifold_window_plan(
            st, kernel_size, overflow_cap=_overflow_cap(st.capacity, k),
            interpret=_interpret(),
            q_bound=query_bound(st.capacity, q_bound_frac),
            window_r=window_r,
        )
    return build_submanifold_rulebook(st, kernel_size)


def apply_submanifold(st: SparseTensor, plan, w, bias=None) -> SparseTensor:
    if isinstance(plan, WindowPlan):
        return window_submanifold_conv(
            st, plan, w, bias, interpret=_interpret()
        )
    return submanifold_conv(st, plan, w, bias)


def build_downsample_plan(
    st: SparseTensor,
    stride: Sequence[int],
    out_capacity: int | None = None,
    backend: str = XLA,
    q_bound_frac_in: float = 1.0,
    q_bound_frac_out: float = 1.0,
) -> Tuple[SparseTensor, object, jax.Array]:
    """Returns (skeleton, plan, dropped) — ``dropped`` counts unique output
    sites lost to the static capacity per event (never silent)."""
    skeleton, dropped = downsample_sites(st, stride, out_capacity, with_dropped=True)
    if backend == WINDOW:
        k = 1
        for ss in stride:
            k *= int(ss)
        plans = build_strided_window_plans(
            st, skeleton, stride, overflow_cap=_overflow_cap(st.capacity, k),
            interpret=_interpret(),
            q_bound=query_bound(skeleton.capacity, q_bound_frac_out),
            rev_q_bound=query_bound(st.capacity, q_bound_frac_in),
        )
        return skeleton, plans, dropped
    return skeleton, build_downsample_rulebook(st, skeleton, stride), dropped


def build_upsample_plan(
    st_coarse: SparseTensor,
    target: SparseTensor,
    stride: Sequence[int],
    backend: str = XLA,
    q_bound_frac_coarse: float = 1.0,
    q_bound_frac_fine: float = 1.0,
):
    """Plan for scn.Deconvolution onto a supplied finer site set.  The
    window backend reuses build_strided_window_plans with the FINE set in
    the input role (see window_engine.window_deconv)."""
    if backend == WINDOW:
        k = 1
        for ss in stride:
            k *= int(ss)
        return build_strided_window_plans(
            target, st_coarse, stride,
            overflow_cap=_overflow_cap(target.capacity, k),
            interpret=_interpret(),
            q_bound=query_bound(st_coarse.capacity, q_bound_frac_coarse),
            rev_q_bound=query_bound(target.capacity, q_bound_frac_fine),
        )
    return build_upsample(st_coarse, target, stride)


def apply_upsample(
    st_coarse: SparseTensor,
    target: SparseTensor,
    plan,
    w,
    bias=None,
) -> SparseTensor:
    import jax.numpy as jnp

    if isinstance(plan, tuple) and plan and isinstance(plan[0], WindowPlan):
        fwd, rev = plan
        out = window_deconv(
            st_coarse, target, fwd, rev, w, interpret=_interpret()
        )
        if bias is not None:
            out = out.with_feats(
                jnp.where(out.row_mask()[..., None], out.feats + bias, 0)
            )
        return out
    return deconv(st_coarse, target, plan, w, bias)


def plan_overflow_dropped(plan) -> jax.Array:
    """Total conv pairs lost to the static overflow-sidecar cap for a plan
    (0 for XLA rulebooks, which are exact by construction). Surfaced as the
    train metric ``overflow/dropped`` to guard against silent accuracy
    corruption (window_engine.py WindowPlan.ov_dropped)."""
    import jax.numpy as jnp

    def one(p):
        tot = jnp.sum(p.ov_dropped)
        if p.q_bound is not None:
            tot = tot + jnp.sum(jnp.maximum(p.q_active - p.q_bound, 0))
        return tot

    if isinstance(plan, WindowPlan):
        return one(plan)
    if isinstance(plan, tuple) and plan and isinstance(plan[0], WindowPlan):
        return sum(one(p) for p in plan)
    return jnp.zeros((), jnp.int32)


def apply_strided(
    st: SparseTensor, skeleton: SparseTensor, plan, w
) -> SparseTensor:
    if isinstance(plan, tuple) and isinstance(plan[0], WindowPlan):
        fwd, rev = plan
        return window_strided_conv(
            st, skeleton, fwd, rev, w, interpret=_interpret()
        )
    return strided_conv(st, skeleton, plan, w)
