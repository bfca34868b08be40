"""Adapter: host-built window plans (io/_hostio.cpp build_window_plans) ->
the WindowPlan / SparseTensor objects the encoder consumes.

The heavy, data-dependent parts of plan construction (site pyramid sort +
unique, exact window starts, overflow-pair compaction) happen in the C++
prefetch workers; only the cheap elementwise query-key computation runs on
device here (qkeys are [B, N, K] — too big to ship, trivial to recompute).

The resulting EncoderPlans is a pytree, so it passes straight through jit /
shard_map as a step input alongside the batch.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pallas.window_conv import (
    compute_query_meta,
    compute_reverse_query_meta,
    compute_strided_query_meta,
    key_deltas,
    window_r_default,
    window_r_for_level,
    window_r_initial as _tuned_r_initial,
    window_r_strided as _tuned_r_strided,
)
from .pallas.window_engine import WindowPlan
from .engine import query_bound
from .rulebook import kernel_offsets
from .sparse_tensor import SparseTensor


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EncoderPlans:
    """Precomputed plans for one Encoder forward/backward pass."""

    initial: WindowPlan  # 5^d plan on the level-0 site set
    series: Tuple[WindowPlan, ...]  # per level 0..depth (3^d kernel)
    down: Tuple[Tuple[WindowPlan, WindowPlan], ...]  # (fwd, rev) per level
    skeletons: Tuple[SparseTensor, ...]  # site sets for levels 1..depth
    site_dropped: jax.Array  # i32[] unique sites lost to level capacities


def _plan_from_host(
    host: Dict[str, jax.Array],
    prefix: str,
    qmeta: jax.Array,
    dkeys,
    q_active: jax.Array,
    offsets: np.ndarray,
    window_r: int | None = None,
    q_bound_frac: float = 1.0,
) -> WindowPlan:
    # ``qmeta`` is the packed [B, 1+nw, M] base-key + validity-mask array
    # (compute_query_meta); the kernels reconstruct query keys from it and
    # the static ``dkeys`` — the old [B, M, K] qkeys materialization +
    # lane transpose (43-200 MB of per-step HBM traffic per level) is gone.
    if window_r is None:
        window_r = window_r_default()
    return WindowPlan(
        qmeta=qmeta,
        start=host[f"{prefix}/start"],
        q_active=q_active,
        ov_src=host[f"{prefix}/ov_src"],
        ov_dst=host[f"{prefix}/ov_dst"],
        ov_k=host[f"{prefix}/ov_k"],
        ov_valid=host[f"{prefix}/ov_valid"],
        ov_dropped=host[f"{prefix}/ov_dropped"],
        offsets=tuple(map(tuple, offsets.tolist())),
        dkeys=tuple(dkeys),
        window_r=window_r,
        q_bound=query_bound(qmeta.shape[2], q_bound_frac),
    )


def encoder_plans_from_host(
    st0: SparseTensor,
    host: Dict[str, jax.Array],
    depth: int,
    initial_kernel,
    series_kernel,
    stride,
    q_bound_frac: float = 1.0,
    q_bound_growth: float = 1.6,
    window_r_initial: int | None = None,
    window_r_series=None,
    window_r_down: int | None = None,
    window_r_rev: int | None = None,
) -> EncoderPlans:
    """Assemble EncoderPlans from the host plan dict (jit-traceable).

    ``st0`` must be the level-0 SparseTensor built from the same batch the
    plans were computed for (build_sparse_tensor's ascending-key sort matches
    the host's — keys are unique, so the orders agree row for row).

    The window_r_* arguments MUST match what build_window_plans was given —
    the kernels slice windows of plan.window_r rows at the host-computed
    starts, so a mismatch silently drops in-window pairs.  Defaults are the
    module constants (what the production trainer passes to the builder);
    scripts that override the builder's sizes must override them here too.
    """
    if window_r_initial is None:
        window_r_initial = _tuned_r_initial()
    if window_r_series is None:
        window_r_series = [window_r_for_level(l) for l in range(depth + 1)]
    if window_r_down is None:
        window_r_down = _tuned_r_strided()
    if window_r_rev is None:
        window_r_rev = window_r_default()
    # Layout-consistency guard: the host built starts for cdiv(caps[0], T)
    # query tiles and clamped them against ITS table length (a function of
    # caps[0]).  A SparseTensor at a different capacity would stage windows
    # past its own table — build it with capacity=caps[0]
    # (ops.build_sparse_tensor) so both sides agree.
    from .pallas.window_conv import TILE_T, _cdiv

    host_tiles = host["lvl0/series/start"].shape[1]
    st_tiles = _cdiv(st0.capacity, TILE_T)
    if host_tiles != st_tiles:
        raise ValueError(
            f"host plans were built for {host_tiles} level-0 query tiles but "
            f"st0 has capacity {st0.capacity} ({st_tiles} tiles); build the "
            f"input SparseTensor with capacity={host_tiles * TILE_T} "
            "(= the GRID_QUANTUM-aligned caps[0] passed to "
            "build_window_plans)"
        )

    def frac(l):
        return min(1.0, q_bound_frac * q_bound_growth**l)

    i_offs = kernel_offsets(initial_kernel, centered=True)
    # series_kernel: one kernel broadcast to all levels, or per-level
    # kernels (2D multiplane plane_merge switches [1,k,k] -> [3,k,k])
    if hasattr(series_kernel[0], "__len__"):
        s_offs_l = [kernel_offsets(kl, centered=True) for kl in series_kernel]
    else:
        s_offs_l = [kernel_offsets(series_kernel, centered=True)] * (depth + 1)
    d_offs = kernel_offsets(stride, centered=False)
    kd = len(d_offs)

    levels = [st0]
    grid = st0.grid_shape
    for l in range(1, depth + 1):
        grid = tuple(-(-g // int(s)) for g, s in zip(grid, stride))
        coords = host[f"lvl{l}/coords"]
        n_active = host[f"lvl{l}/n_active"]
        levels.append(
            SparseTensor(
                coords=coords,
                feats=jnp.zeros((*coords.shape[:2], 0), st0.feats.dtype),
                n_active=n_active,
                grid_shape=grid,
            )
        )

    initial = _plan_from_host(
        host, "initial",
        compute_query_meta(st0, i_offs),
        key_deltas(st0.grid_shape, i_offs), st0.n_active, i_offs,
        window_r=window_r_initial,
        q_bound_frac=frac(0),
    )
    series = tuple(
        _plan_from_host(
            host, f"lvl{l}/series",
            compute_query_meta(levels[l], s_offs_l[l]),
            key_deltas(levels[l].grid_shape, s_offs_l[l]),
            levels[l].n_active, s_offs_l[l],
            window_r=window_r_series[l],
            q_bound_frac=frac(l),
        )
        for l in range(depth + 1)
    )
    down = tuple(
        (
            _plan_from_host(
                host, f"lvl{l}/down_f",
                compute_strided_query_meta(
                    levels[l + 1], levels[l].grid_shape, stride, d_offs
                ),
                key_deltas(levels[l].grid_shape, d_offs),
                levels[l + 1].n_active, d_offs,
                window_r=window_r_down,
                q_bound_frac=frac(l + 1),
            ),
            _plan_from_host(
                host, f"lvl{l}/down_r",
                compute_reverse_query_meta(
                    levels[l], levels[l + 1], stride, kd
                ),
                (0,) * kd,
                levels[l].n_active, d_offs,
                window_r=window_r_rev,
                q_bound_frac=frac(l),
            ),
        )
        for l in range(depth)
    )
    site_dropped = sum(
        (jnp.sum(host[f"lvl{l}/site_dropped"]) for l in range(1, depth + 1)),
        jnp.zeros((), jnp.int32),
    )
    return EncoderPlans(
        initial=initial,
        series=series,
        down=down,
        skeletons=tuple(levels[1:]),
        site_dropped=site_dropped,
    )
