"""Sorted-window implicit-GEMM sparse convolution (Pallas, TPU-native).

The reference's SCN engine resolves (site, kernel-offset) -> neighbor row via
C++ hash tables; XLA's dynamic gather runs at ~16ns/row on TPU, which made a
dune3d training step gather-bound (~26 s).  This engine removes random access
entirely by exploiting the sorted-COO invariant (sparse_tensor.py):

  * Neighbor queries ``q = key_i + lin(delta)`` are monotone per offset, and
    for detector-style data the matching rows of one query tile span ~T rows
    (span p99 <= ~220 at every pyramid level, scripts/measure_spans.py).
  * The plan kernel computes an EXACT, 16-aligned window start per
    (tile, offset) in two stages: a coarse anchor pass (keys[::A]) narrows
    each query to a 128-row block, then the exact match positions inside a
    staged PLAN_R-row window give the true minimum.  Exact starts let the
    conv window shrink to WINDOW_R=176 rows (vs 256 when starts were
    quantized to anchor blocks) at a <1% out-of-window pair rate.
  * Per output tile, a dynamic VMEM slice of R consecutive table rows covers
    (almost) all matches; the match matrix is built by **key equality**
    (keys are unique) and contracted on the MXU:
        out[T] = (win_keys[R] == q[T])^T @ win_table[R, C] @ W
    The equality compare is laid out [R, T] so the 128-query tile fills the
    lane dimension exactly — R pays no 128-lane padding, so shrinking R
    shrinks the VPU compare cost linearly (the round-1 layout [T, R] padded
    R up to a lane multiple, wasting 37% at R=160).
  * Tiles past a batch element's ``n_active`` are skipped outright (the
    static capacity is a budget, not the workload).
  * The rare out-of-window pairs are resolved exactly by a small compacted
    XLA sidecar (see window_engine) once per site set.

Everything is static-shaped; the only data-dependent values are scalar window
starts computed by the plan kernel (carried in SMEM) and the per-element
live-tile counts.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse_tensor import INVALID_KEY, SparseTensor, linearize

# Tunables: T output rows per tile (lane dim of the compare), A anchor stride,
# R conv window rows, PLAN_R plan-stage window rows. R/PLAN_R are sublane
# dims — any multiple of 16 works; starts are aligned to 16 (bf16 sublane
# tile) so dynamic slices stay tile-aligned.
import os as _os

TILE_T = 128
ANCHOR_A = 128
# Submanifold window rows (default 176: per-tile span p99 <= ~220, <1%
# out-of-window pairs).  Smaller R trades sidecar load for kernel time —
# the R sweep is env-tunable because plan build (host C++ or device) and
# the conv kernels must agree on it.
# R=144 for the shallow levels: with the weight-fused kernel the compare
# and the K*R-contraction dot are both R-linear and 160->144 measured
# -5.2%/conv in-chain (r_sweep_probe, max sidecar 174 entries — well under
# the capacity//8 caps).  R=128 REGRESSES: sidecars jump to ~730 entries
# and the serial fori_loop eats the savings.  Deep levels (>= DEEP_FROM)
# keep R=160 — their per-tile match spans are wider relative to capacity
# (ov_occupancy: L3 is 381/390 at R=144, one bad event from dropping).
import dataclasses as _dataclasses
from typing import Optional as _Optional


@_dataclasses.dataclass
class WindowTuning:
    """One source of truth for the window-engine tuning knobs.

    Precedence: ``SEID_*`` env vars (bisect/bench overrides) > values
    configured from the config tree (``configure_tuning``, called by the
    trainer/bench from ``framework.tuning``) > these defaults.  Host plan
    builders and the conv kernels both read the SAME resolved values, and
    ``host_plans`` guards layout agreement — a window_r set for a bench
    but not the trainer can no longer silently corrupt convs (the round-2
    hazard class, PERF_NOTES 'Fixed hazards')."""

    # Defaults are sized for FULL dune3d occupancy (26-42k active voxels,
    # /tmp/rinit_sweep r3): R=144 shallow/initial is a cliff there — the
    # initial 5^3 plan alone dropped ~4.8k overflow pairs/event past its
    # sidecar cap.  160/176 are drop-free at recipe occupancy; benches at
    # lighter occupancy may still pick 144 via framework.tuning (their
    # overflow_dropped output is the exactness guard).
    window_r: int = 160
    window_r_strided: int = 320
    window_r_initial: int = 176
    window_r_deep: int = 160
    window_r_deep_from: int = 3
    p_series: int = 4  # query tiles per grid step for K<=32 kernels
    # tri-state kernel-formulation switches (None = size-based auto)
    group: _Optional[bool] = None
    ct: _Optional[bool] = None
    wfuse: _Optional[bool] = None
    fused_bwd: _Optional[bool] = None
    batched_sidecar: _Optional[bool] = None


_ENV_INT = {
    "SEID_WINDOW_R": "window_r",
    "SEID_WINDOW_R_STRIDED": "window_r_strided",
    "SEID_WINDOW_R_INITIAL": "window_r_initial",
    "SEID_WINDOW_R_DEEP": "window_r_deep",
    "SEID_WINDOW_R_DEEP_FROM": "window_r_deep_from",
    "SEID_P_SERIES": "p_series",
}


def _apply_env(t: WindowTuning) -> WindowTuning:
    for var, field in _ENV_INT.items():
        if _os.environ.get(var):
            setattr(t, field, int(_os.environ[var]))
    if not _os.environ.get("SEID_WINDOW_R_DEEP"):
        t.window_r_deep = max(t.window_r, t.window_r_deep)
    # tri-states: env forces, otherwise leave the configured/auto value
    if _os.environ.get("SEID_GROUP") is not None:
        t.group = _os.environ["SEID_GROUP"] == "1"
    if _os.environ.get("SEID_CT") is not None:
        t.ct = _os.environ["SEID_CT"] == "1"
    if _os.environ.get("SEID_WFUSE") is not None:
        t.wfuse = _os.environ["SEID_WFUSE"] == "1"
    if _os.environ.get("SEID_FUSED_BWD") is not None:
        t.fused_bwd = _os.environ["SEID_FUSED_BWD"] == "1"
    if _os.environ.get("SEID_SIDECAR") == "serial":
        t.batched_sidecar = False
    return t


TUNING = _apply_env(WindowTuning())


def configure_tuning(**overrides) -> WindowTuning:
    """Install config-tree tuning values (env vars still win).

    Called by the trainer/bench with the ``framework.tuning`` group.
    Unknown keys are rejected loudly.  Returns the resolved tuning."""
    global TUNING
    base = WindowTuning()
    for key, val in overrides.items():
        if not hasattr(base, key):
            raise KeyError(f"unknown window tuning knob {key!r}")
        if val is not None:
            setattr(base, key, val)
    TUNING = _apply_env(base)
    return TUNING


# Legacy module-level aliases (import-time snapshots — new code should call
# the accessors below, which follow configure_tuning):
WINDOW_R = TUNING.window_r
WINDOW_R_STRIDED = TUNING.window_r_strided
TILES_PER_STEP = TUNING.p_series


def window_r_default() -> int:
    return TUNING.window_r


def window_r_strided() -> int:
    return TUNING.window_r_strided


def window_r_initial() -> int:
    return TUNING.window_r_initial
# Initial 5^d conv window (tuning.window_r_initial): per-tile match spans
# are ~half the series conv's (scripts/window_r_analysis.py: p50=55 vs
# 90-122) and the C=1 path's compare/select cost is linear in K*R with
# K=125 — a smaller window pays off 5x there.  R=144 measured -4 ms/step
# vs 176 with sidecar occupancy 520/12288 — exactness-safe at 20x margin.
#
# Per-level series windows (window_r / window_r_deep / _deep_from): the
# MXU one-hot dot is PASS-quantized (ceil(R/128) passes per offset), so
# R=128 halves the dominant dot at the shallow levels.  Deep levels can't
# follow: their sidecar caps (capacity//8) sit below the out-of-window
# pair counts at R=128 (scripts/ov_occupancy.py: L2+ drop pairs) — they
# keep a wider R.
WINDOW_R_INITIAL = TUNING.window_r_initial  # legacy import-time alias


def window_r_for_level(level: int) -> int:
    """Series-conv window size for an encoder level."""
    t = TUNING
    return t.window_r if level < t.window_r_deep_from else t.window_r_deep


# strided fwd: parent table is ~2x denser than the child queries, so
# per-tile spans approach 2*T
PLAN_R = 384
START_ALIGN = 16


def _group_size(k: int, c: int) -> int:
    """Offsets per MXU group.  Default 1 = the batched-over-K formulation:
    calibrated in-program chain timings (scripts/chain_probe.py /
    kernel_variants.py) showed the block-diagonal grouped form is never
    faster once the ~2.8 ms per-executable launch latency is subtracted
    (grouped 4.29 ms vs batched 4.22 at C=32, and batched responds to
    WINDOW_R shrinks while grouped does not).  tuning.group=True (or
    SEID_GROUP=1) re-enables grouping (C must divide the 32-lane store
    granule) for experiments."""
    if TUNING.group is not True:
        return 1
    if c < 32 or 128 % c != 0:
        return 1
    return max(1, min(k, 128 // c))

def _use_ct(c: int, co: int) -> bool:
    """Transposed ("CT") kernel formulation: both MXU dots put the T=128
    query tile in the OUTPUT LANE dim instead of the channel dim —
    [K,R,C]x[K,R,T] -> [K,C,T] and [CO,KC]x[KC,T] -> [CO,T] — so at C=32
    the dots stop wasting 3/4 of the MXU output lanes.  The [B,CO,M] ->
    [B,M,CO] layout fix-up happens OUTSIDE the kernel as one cheap XLA
    transpose.  Needs C,CO multiples of 16 (bf16 sublane tile) for the
    block-row scratch stores.  tuning.ct / SEID_CT=0 force."""
    if TUNING.ct is False:
        return False
    # c == 1 rides the CT output layout too, with a select-based gather
    # (see _conv_kernel): the [K,R,1] gather dot would use 1/128 MXU lanes.
    return (c % 16 == 0 or c == 1) and co % 16 == 0


def _use_wfuse(k: int, c: int, co: int) -> bool:
    """Weight-fused CT forward (premultiply the staged windows by the
    weights, then one (K*R)-contraction dot).  The premultiply is a
    [K,R,C]x[K,C,CO] dot PER TILE — K*C*CO work that is redundant across
    tiles — so it only pays while C*CO is small enough that both dots hide
    under the VPU compare/staging work.  Measured (level_probe, fwd+bwd
    per conv): C=32..128 weight-fused wins (L0 8.7 vs 14.7 ms legacy);
    C=160 it LOSES 2x (9.9 vs 5.7) — the premultiply dominates.  The
    budget 27*128*128 keeps every measured winner and routes C>=160
    series convs to the two-step CT form.  tuning.wfuse / SEID_WFUSE
    force."""
    if TUNING.wfuse is not None:
        return TUNING.wfuse
    return k * c * co <= 27 * 128 * 128


def _tiles_per_step(k: int) -> int:
    """Query tiles per grid step.  Calibrated chain timings: P=4 is
    slightly faster than P=1 at K=27 (4.22 vs 4.41 ms in-program); at
    K=125 the unrolled body scales with K*P and the compile blows up
    (a K=125 P=4 module timed out the compile service), so the 5^3
    initial conv stays at P=1.  SEID_P forces a value for bisects."""
    env = _os.environ.get("SEID_P")
    if env:
        return int(env)
    return 1 if k > 32 else TUNING.p_series


# Sentinel for invalid queries: never equals a real key (>= 0) nor the
# INVALID_KEY padding of the table.
INVALID_QUERY = np.int32(-2)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def compute_query_keys(st: SparseTensor, offsets: np.ndarray) -> jax.Array:
    """q[b, n, k] = linearize(coords + offsets[k]) or INVALID_QUERY.

    Key-arithmetic formulation: the shifted key is key + delta_key(k) (the
    linearization is affine), so the rank-4 [B, N, K, 3] coordinate tensor
    never materializes — at K=125 the naive form cost ~1.2 GB of HBM
    traffic per step in broadcast_add/and_select fusions (trace r2)."""
    offs = np.asarray(offsets, np.int64)
    g = [int(x) for x in st.grid_shape]
    dkey = np.asarray(
        (offs[:, 0] * g[1] + offs[:, 1]) * g[2] + offs[:, 2], np.int32
    )
    keys = st.keys()  # [B, N] (INVALID_KEY at padding)
    qk = keys[:, :, None] + dkey[None, None, :]
    valid = st.row_mask()[:, :, None]
    for d in range(3):
        cd = st.coords[..., d][:, :, None] + jnp.asarray(
            offs[:, d], jnp.int32
        )[None, None, :]
        valid = valid & (cd >= 0) & (cd < g[d])
    return jnp.where(valid, qk, INVALID_QUERY)


def compute_strided_query_keys(
    skeleton: SparseTensor,
    parent_grid: Tuple[int, ...],
    stride,
    offsets: np.ndarray,
) -> jax.Array:
    """Forward downsample queries: linearize(out*stride + delta) in the
    PARENT grid, or INVALID_QUERY.  Same key-arithmetic trick as
    compute_query_keys: linearize(c*s + d) = linearize(c*s) + delta_key."""
    offs = np.asarray(offsets, np.int64)
    g = [int(x) for x in parent_grid]
    s = [int(x) for x in stride]
    dkey = np.asarray(
        (offs[:, 0] * g[1] + offs[:, 1]) * g[2] + offs[:, 2], np.int32
    )
    c = skeleton.coords
    base = (
        (c[..., 0] * np.int32(s[0]) * np.int32(g[1])
         + c[..., 1] * np.int32(s[1])) * np.int32(g[2])
        + c[..., 2] * np.int32(s[2])
    )  # [B, N] linearize(c*stride) — garbage at padding (-1 coords), masked
    qk = base[:, :, None] + dkey[None, None, :]
    valid = skeleton.row_mask()[:, :, None]
    for d in range(3):
        cd = c[..., d][:, :, None] * np.int32(s[d]) + jnp.asarray(
            offs[:, d], jnp.int32
        )[None, None, :]
        valid = valid & (cd >= 0) & (cd < g[d])
    return jnp.where(valid, qk, INVALID_QUERY)


def _bit_mask(bit: int) -> np.int32:
    """i32 constant with only ``bit`` set (two's-complement safe at 31)."""
    return np.int32(-(2**31)) if bit == 31 else np.int32(1 << bit)


def key_deltas(grid, offsets) -> Tuple[int, ...]:
    """Static per-offset key deltas: linearize(c + off) = linearize(c) +
    delta (the linearization is affine), so kernels reconstruct query keys
    from the site's own key + these compile-time constants."""
    g = [int(x) for x in grid]
    offs = np.asarray(offsets, np.int64)
    d = offs[:, 0]
    for dim in range(1, offs.shape[1]):
        d = d * g[dim] + offs[:, dim]
    return tuple(int(v) for v in d)


def meta_words(k: int) -> int:
    """Validity-bitmask words in a query-meta array (32 offsets per word)."""
    return _cdiv(k, 32)


def _meta_from_base(base, rm, per_k_valid, k):
    """Pack [B, M] base keys + per-offset validity into [B, 1+nw, M] i32.

    Row 0 is the base key (INVALID_QUERY where the row is dead); row 1+w
    holds bit ``kk % 32`` of word ``kk // 32`` set iff query ``kk`` is live.
    This replaces the materialized [B, M, K] qkeys (43-200 MB per level at
    dune3d scale, rebuilt every step): the conv kernels recompute
    qk = base + key_deltas[kk] in registers and mask with the bit."""
    words = []
    for wi in range(meta_words(k)):
        acc = jnp.zeros(rm.shape, jnp.int32)
        for bit in range(min(32, k - 32 * wi)):
            v = per_k_valid(wi * 32 + bit)
            acc = acc | jnp.where(v, _bit_mask(bit), jnp.int32(0))
        words.append(acc)
    base = jnp.where(rm, base, INVALID_QUERY)
    return jnp.stack([base] + words, axis=1)


def _dim_range_masks(coords, offs, g, scale=None):
    """dim_ok[d][off_value] -> bool [B, M] (None = always true): shared
    range compares for the handful of distinct offset values per dim."""
    dim_ok = []
    for d in range(offs.shape[1]):
        s = 1 if scale is None else int(scale[d])
        dd = {}
        for v in sorted({int(x) for x in offs[:, d]}):
            if s == 1 and v == 0:
                dd[v] = None  # the site's own coordinate is in range
            else:
                cd = coords[..., d] * np.int32(s) + np.int32(v)
                dd[v] = (cd >= 0) & (cd < g[d])
        dim_ok.append(dd)
    return dim_ok


def compute_query_meta(st: SparseTensor, offsets: np.ndarray) -> jax.Array:
    """[B, 1+nw, M] query meta for a submanifold plan (see _meta_from_base).
    Pair with key_deltas(st.grid_shape, offsets)."""
    offs = np.asarray(offsets, np.int64)
    g = [int(x) for x in st.grid_shape]
    rm = st.row_mask()
    dim_ok = _dim_range_masks(st.coords, offs, g)

    def valid(kk):
        v = rm
        for d in range(offs.shape[1]):
            m = dim_ok[d][int(offs[kk, d])]
            if m is not None:
                v = v & m
        return v

    return _meta_from_base(st.keys(), rm, valid, len(offs))


def compute_strided_query_meta(
    skeleton: SparseTensor,
    parent_grid: Tuple[int, ...],
    stride,
    offsets: np.ndarray,
) -> jax.Array:
    """[B, 1+nw, M] meta for forward downsample queries: base =
    linearize(c*stride) in the PARENT grid.  Pair with
    key_deltas(parent_grid, offsets)."""
    offs = np.asarray(offsets, np.int64)
    g = [int(x) for x in parent_grid]
    s = [int(x) for x in stride]
    c = skeleton.coords
    base = c[..., 0] * np.int32(s[0])
    for d in range(1, offs.shape[1]):
        base = base * np.int32(g[d]) + c[..., d] * np.int32(s[d])
    rm = skeleton.row_mask()
    dim_ok = _dim_range_masks(c, offs, g, scale=s)

    def valid(kk):
        v = rm
        for d in range(offs.shape[1]):
            m = dim_ok[d][int(offs[kk, d])]
            if m is not None:
                v = v & m
        return v

    return _meta_from_base(base, rm, valid, len(offs))


def compute_reverse_query_meta(
    st: SparseTensor, skeleton: SparseTensor, stride, k: int
) -> jax.Array:
    """[B, 2, M] meta for reverse downsample queries: one live offset column
    per input row (its parent's key at the row's intra-cell offset).
    Pair with dkeys = (0,) * k."""
    assert k <= 32, f"reverse meta packs offsets into one word (k={k})"
    stride_arr = jnp.asarray(stride, jnp.int32)
    parent = st.coords // stride_arr
    pkey = linearize(parent, skeleton.grid_shape)
    rem = st.coords - parent * stride_arr
    off_id = rem[..., 0]
    for d in range(1, rem.shape[-1]):
        off_id = off_id * np.int32(int(stride[d])) + rem[..., d]
    rm = st.row_mask() & (pkey != INVALID_KEY)
    word = jnp.where(
        rm, jnp.left_shift(jnp.int32(1), off_id), jnp.int32(0)
    )
    base = jnp.where(rm, pkey, INVALID_QUERY)
    return jnp.stack([base, word], axis=1)


def materialize_qkeys(qmeta: jax.Array, dkeys) -> jax.Array:
    """[B, K, M] lane-transposed query keys reconstructed from packed meta
    — the pre-round-5 representation.  For probe scripts and debugging
    only: the production kernels never materialize this (that was the
    point of the qmeta refactor)."""
    base = qmeta[:, 0, :]
    k = len(dkeys)
    cols = []
    for kk in range(k):
        word = qmeta[:, 1 + kk // 32, :]
        live = (word & _bit_mask(kk % 32)) != 0
        cols.append(jnp.where(live, base + np.int32(dkeys[kk]),
                              INVALID_QUERY))
    return jnp.stack(cols, axis=1)


def _pad_rows(x: jax.Array, n_to: int, fill) -> jax.Array:
    n = x.shape[1]
    if n == n_to:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, n_to - n)
    return jnp.pad(x, pad, constant_values=fill)


def _padded_table(keys: jax.Array, feats: jax.Array):
    """Pad keys/feats so any window slice [start, start+PLAN_R) is in range.

    PLAN-BUILD path only: the plan kernel stages PLAN_R-row windows.  The
    conv kernels use _conv_table — their starts are clamped to
    conv_max_start (the table array itself), so no slack rows are needed."""
    b, n = keys.shape
    npad = _round_up(n, ANCHOR_A) + PLAN_R
    pk = _pad_rows(keys[..., None], npad, INVALID_KEY)[..., 0]
    pt = _pad_rows(feats, npad, 0)
    return pk, pt


def _conv_table(keys: jax.Array, feats: jax.Array, window_r: int):
    """Table arrays for the conv/gather/dw/bwd kernels.

    Plans clamp window starts to conv_max_start(len, r), so slices
    [start, start+r) stay inside max(round16(len), round16(r)) rows — with
    GRID_QUANTUM-aligned level capacities this is a NO-OP (the pad was a
    51 MB HBM round-trip per conv at dune3d scale).  Window rows past
    n_active hold INVALID keys (never match) and finite features (zeros or
    stale level data), so they contribute exactly nothing."""
    n = keys.shape[1]
    npad = max(_round_up(n, 16), _round_up(window_r, 16))
    if npad == n:
        return keys, feats
    pk = _pad_rows(keys[..., None], npad, INVALID_KEY)[..., 0]
    pt = _pad_rows(feats, npad, 0)
    return pk, pt


def _live_tiles(n_active: jax.Array, m: int) -> jax.Array:
    """i32[B] — number of query tiles with at least one live row."""
    n_tiles = _cdiv(m, TILE_T)
    return jnp.minimum(
        (n_active.astype(jnp.int32) + TILE_T - 1) // TILE_T, n_tiles
    )


# --------------------------------------------------------------------------
# Plan kernel: exact 16-aligned window start per (tile, offset) + uncovered
# --------------------------------------------------------------------------

def conv_max_start(table_cap: int, window_r: int) -> int:
    """Largest window start the conv kernels may use: their table is the
    level's [B, cap, C] array itself (16-rounded when unaligned), NOT the
    plan-staging npad — windows must satisfy start + r <= that length.
    Mirrors io/_hostio_core.h conv_max_start."""
    length = max(_round_up(table_cap, 16), _round_up(window_r, 16))
    return length - window_r


def _plan_kernel(
    live_ref,  # SMEM i32[1, 1] live tile count for this batch element
    anchors_ref,  # [1, n_anchor_pad, 1] VMEM (sublane-major)
    keys_ref,  # [1, Npad, 1] VMEM (sublane-major)
    qk_ref,  # [1, T, K] VMEM
    start_ref,  # [1, n_tiles, K] SMEM out
    uncov_ref,  # [1, T, K] VMEM out
    *,
    k: int,
    npad: int,
    r_conv: int,
    max_start: int,
):
    tile = pl.program_id(1)
    big = jnp.int32(2**30)

    @pl.when(tile >= live_ref[pl.program_id(0), 0])
    def _dead():
        for kk in range(k):
            start_ref[0, tile, kk] = 0
        uncov_ref[0] = jnp.zeros(uncov_ref.shape[1:], uncov_ref.dtype)

    @pl.when(tile < live_ref[pl.program_id(0), 0])
    def _live():
        anchors = anchors_ref[0, :, 0]  # [n_anchor_pad] sublane
        qt = qk_ref[0].transpose(1, 0)  # [K, T] lanes=T
        for kk in range(k):
            q = qt[kk]  # [T] lane vector
            valid = q >= 0
            # coarse: anchor block per query ([n_anchor, T], lanes=T)
            le = (anchors[:, None] <= q[None, :]) & (
                anchors[:, None] != INVALID_KEY
            )
            bl = jnp.sum(le.astype(jnp.int32), axis=0) - 1  # [T]
            pos_blk = bl * ANCHOR_A
            coarse = jnp.min(jnp.where(valid & (bl >= 0), pos_blk, big))
            coarse = jnp.minimum(coarse, npad - PLAN_R)
            # keep the conv window (start <= max_start below) a subset of
            # the plan window: queries whose anchor escapes the shifted
            # plan window become ~cov -> sidecar, preserving exactness
            coarse = jnp.minimum(coarse, (max_start // ANCHOR_A) * ANCHOR_A)
            coarse = jnp.maximum(coarse, 0)
            coarse = pl.multiple_of(coarse, ANCHOR_A)
            # a query's match (if any) lies inside its anchor block; the
            # block must sit inside the staged plan window for the exact
            # position below to be trusted.
            cov = (
                (bl >= 0)
                & (pos_blk >= coarse)
                & (pos_blk + ANCHOR_A <= coarse + PLAN_R)
            )
            win = keys_ref[0, pl.ds(coarse, PLAN_R), 0]  # [PLAN_R] sublane
            lt = (win[:, None] < q[None, :]).astype(jnp.int32)
            # pos = clip(true insertion position, coarse, coarse + PLAN_R):
            # exact for matches inside the plan window, clamped outside.
            pos = coarse + jnp.sum(lt, axis=0)  # [T]
            hit = jnp.any(win[:, None] == q[None, :], axis=0)  # [T]
            live_min = jnp.min(
                jnp.where(valid & cov & hit, pos, big)
            )
            # The conv window MUST stay a subset of the plan window: then
            # ``inwin`` below is exact, and a ~cov query whose match still
            # lands inside the conv window is never double-counted by the
            # sidecar (it reads hit=True, inwin=True here).
            start = (live_min // START_ALIGN) * START_ALIGN
            start = jnp.minimum(start, coarse + PLAN_R - r_conv)
            start = jnp.maximum(start, coarse)
            # conv tables end at the level capacity (no +PLAN_R slack);
            # >= coarse still holds since coarse <= align(max_start)
            start = jnp.minimum(start, max_start)
            inwin = hit & (pos >= start) & (pos < start + r_conv)
            # candidates: matched-in-plan-but-outside-conv-window (exact),
            # plus anything whose anchor block escaped the plan window
            # (may be matched beyond it; the sidecar's exact lookup drops
            # the unmatched ones).
            uncovered = valid & (bl >= 0) & (~inwin) & (hit | ~cov)
            start_ref[0, tile, kk] = start
            uncov_ref[0, :, kk] = uncovered.astype(jnp.int32)


def window_plan(
    padded_keys: jax.Array,  # [B, Npad] (INVALID_KEY padded)
    qkeys: jax.Array,  # [B, N, K]
    n_active: jax.Array,  # i32[B] live rows on the QUERY side
    interpret: bool = False,
    window_r: int | None = None,
    table_cap: int | None = None,  # UNPADDED table length (conv bound)
) -> Tuple[jax.Array, jax.Array]:
    """-> (start i32[B, n_tiles, K], uncovered i32[B, N, K])."""
    if window_r is None:  # resolve LIVE tuning, never the
        window_r = window_r_default()  # import-time snapshot
    b, npad = padded_keys.shape
    if table_cap is None:
        table_cap = npad
    _, n, k = qkeys.shape
    n_tiles = _cdiv(n, TILE_T)
    n_anchor = npad // ANCHOR_A
    n_anchor_pad = _round_up(n_anchor, 8)
    anchors = padded_keys[:, :: ANCHOR_A][:, :n_anchor]
    anchors = jnp.pad(
        anchors, ((0, 0), (0, n_anchor_pad - n_anchor)),
        constant_values=INVALID_KEY,
    )[..., None]  # [B, n_anchor_pad, 1]
    live2 = _live_tiles(n_active, n)[:, None]
    kern = functools.partial(
        _plan_kernel, k=k, npad=npad, r_conv=window_r,
        max_start=conv_max_start(table_cap, window_r),
    )
    start, uncov = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(live2.shape, lambda bb, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_anchor_pad, 1), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, 1), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T, k), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_tiles, k), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE_T, k), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_tiles, k), jnp.int32),
            jax.ShapeDtypeStruct((b, n_tiles * TILE_T, k), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        live2,
        anchors,
        padded_keys[..., None],
        _pad_rows(qkeys, n_tiles * TILE_T, INVALID_QUERY),
    )
    return start, uncov[:, :n]


# --------------------------------------------------------------------------
# Conv kernel: windowed equality one-hot x table x weights
# --------------------------------------------------------------------------

def _q_rows(qm_ref, sl, k, dkeys, kmap):
    """Query keys per offset, recomputed in registers from the packed meta
    block (row 0 base key, rows 1+ validity words): qk = base + dkeys[kk]
    where the offset's bit is set, INVALID_QUERY otherwise.  ``kmap``
    remaps kernel slot -> meta offset (the mirrored backward's perm) at
    zero runtime cost.  Replaces the [B, K, M] qkeys HBM reads (43-200 MB
    per launch at dune3d scale) with ~3 VPU ops per [T] row."""
    base = qm_ref[0, 0, sl]
    words = [qm_ref[0, 1 + wi, sl] for wi in range(meta_words(k))]

    def row(kk):
        b = kk if kmap is None else kmap[kk]
        live = (words[b // 32] & _bit_mask(b % 32)) != 0
        return jnp.where(live, base + np.int32(dkeys[b]), INVALID_QUERY)

    return row


def _k_col(kk: int, kmap) -> int:
    """Start-table column for kernel slot kk (kmap remaps, statically)."""
    return kk if kmap is None else kmap[kk]


def _rm_out() -> bool:
    """Row-major in-kernel emit for the CT kernels: transpose the final
    [CO, T] dot result in registers and store [T, CO] directly, instead of
    storing CT and paying an XLA layout copy per conv (plus its launch
    gap).  MEASURED IN-STEP round 5 and REJECTED as the default: bench
    28.55 vs 29.19 ev/s — the in-kernel [CO,128]->[128,CO] transposes on
    every live tile (fwd out, bwd dx, plus the row-major x reads in the
    fused backward) cost more than the per-conv XLA copies + launch gaps
    they replace, confirming the r3 store-probe pricing from the in-step
    side.  Bit-exact either way (check_window_tpu 2026-08-21).
    SEID_RM_OUT=1 re-enables for experiments."""
    return _os.environ.get("SEID_RM_OUT", "0") == "1"


def _conv_kernel(
    live_ref,  # SMEM i32[B, 1]
    keys_ref,  # [1, Npad, 1] VMEM (sublane-major)
    table_ref,  # [1, Npad, C] VMEM
    qk_ref,  # [1, 1+nw, P*T] VMEM (packed query meta: base + mask words)
    start_ref,  # [1, n_tiles, K] SMEM (full)
    w_ref,  # wfuse: [K, C, CO]; else [KC_pad or Gn*GL, CO] VMEM
    out_ref,  # [1, P*T, CO] VMEM
    *scratch,  # G=1 ct: (oh [K, R, T], s [K, R, C]); legacy adds g
    #            G>1: (oh [Gn, G*R, T], s [Gn, G*R, G*C])
    k: int,
    c: int,
    kc_pad: int,
    window_r: int,
    p: int,
    dkeys: Tuple[int, ...],
    kmap: Tuple[int, ...] | None = None,
    ct: bool = False,
    wfuse: bool = False,
    rm: bool = False,
):
    """P query tiles per step.

    G=1 (default): ONE batched-over-K dot, a scratch round-trip, then a
    single big weight GEMM — the MXU stays on two large ops per tile
    (measured fastest end-to-end; a per-offset loop of small dots
    regressed the full step by ~25%).  With ``ct`` (the default when
    C, CO are sublane-tile multiples) both dots put T=128 in the OUTPUT
    LANES: [K,R,C]x[K,R,T] -> [K,C,T] into a [KC, T] scratch, then
    [CO,KC]x[KC,T] -> [CO,T], stored to a [B, CO, M] output that the
    wrapper transposes once outside the kernel — at C=32 the legacy
    orientation wasted 3/4 of the MXU output lanes on both dots.
    ``wfuse`` (shallow levels only, see _use_wfuse) replaces the scratch
    round-trip with a per-tile weight premultiply.

    G>1 (experiments only, see _group_size): offsets packed G=128//C per
    block-diagonal dot.  Group g stages offset kk=g*G+j's window at rows
    [j*R, (j+1)*R) and lanes [j*C, (j+1)*C): off-diagonal blocks (and the
    tail group's unused slots) are zeroed ONCE at the first grid step and
    never written again, so each grouped dot yields [T, G*C] — a direct
    lane-slice of the implicit [T, K*C] gathered matrix, consumed by the
    weight GEMM without any scratch round-trip."""
    step = pl.program_id(1)
    g_off = _group_size(k, c)
    n_groups = _cdiv(k, g_off)
    glanes = g_off * c
    if g_off == 1:
        if ct and c == 1:
            g_scratch, = scratch
        elif ct:
            # wfuse and two-step CT both work on dot-result values —
            # no [KC, T] scratch round-trip.
            oh_scratch, s_scratch = scratch
        else:
            g_scratch, oh_scratch, s_scratch = scratch
        if ct and c == 1 and kc_pad > k * c:
            # pad ROWS of the c==1 [KC_pad, T] scratch are never written
            # by the per-offset stores; uninitialized VMEM can hold NaN
            # patterns and 0 * NaN would poison the weight GEMM — zero
            # them once.
            @pl.when((pl.program_id(0) == 0) & (step == 0))
            def _zero_pad():
                g_scratch[k * c:, :] = jnp.zeros_like(g_scratch[k * c:, :])
    else:
        oh_scratch, s_scratch = scratch

        @pl.when((pl.program_id(0) == 0) & (step == 0))
        def _init():
            s_scratch[...] = jnp.zeros_like(s_scratch)
            oh_scratch[...] = jnp.zeros_like(oh_scratch)

    for pp in range(p):
        tile = step * p + pp

        @pl.when(tile >= live_ref[pl.program_id(0), 0])
        def _dead(pp=pp):
            if ct and not rm:
                out_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = jnp.zeros(
                    (out_ref.shape[1], TILE_T), out_ref.dtype
                )
            else:
                out_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :] = jnp.zeros(
                    (TILE_T, out_ref.shape[2]), out_ref.dtype
                )

        @pl.when(tile < live_ref[pl.program_id(0), 0])
        def _live(pp=pp, tile=tile):
            qrow = _q_rows(
                qk_ref, slice(pp * TILE_T, (pp + 1) * TILE_T), k, dkeys, kmap
            )
            if g_off == 1:
                if ct and c == 1:
                    # C=1 (the 5^d initial conv): one-hot x scalar table ==
                    # masked select, so the gather is a VPU select+sublane
                    # reduction per offset straight into g2's row kk — no
                    # [K,R,1] dot (1/128 MXU lane use) and no oh/s staging.
                    for kk in range(k):
                        start = pl.multiple_of(
                            start_ref[0, tile, _k_col(kk, kmap)], START_ALIGN
                        )
                        win = keys_ref[0, pl.ds(start, window_r), 0]
                        xw = table_ref[0, pl.ds(start, window_r), 0].astype(
                            jnp.float32
                        )
                        oh = win[:, None] == qrow(kk)[None, :]  # [R, T]
                        g_scratch[kk, :] = jnp.sum(
                            jnp.where(oh, xw[:, None], 0.0), axis=0
                        )
                    oc1 = jax.lax.dot_general(  # [CO, T]
                        w_ref[:], g_scratch[:].astype(w_ref.dtype),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(out_ref.dtype)
                    if rm:
                        out_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :] = oc1.T
                    else:
                        out_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = oc1
                    return
                for kk in range(k):
                    start = pl.multiple_of(
                        start_ref[0, tile, _k_col(kk, kmap)], START_ALIGN
                    )
                    win = keys_ref[0, pl.ds(start, window_r), 0]
                    oh_scratch[kk] = (
                        win[:, None] == qrow(kk)[None, :]
                    ).astype(oh_scratch.dtype)  # [R, T]
                    s_scratch[kk] = table_ref[0, pl.ds(start, window_r), :]
                if ct and wfuse:
                    # Weight-fused single-pass: premultiply the staged
                    # windows by the weights (batched over K), then ONE
                    # (K*R)-contraction dot -> [CO, T].  Removes the [K, C,
                    # T] -> [KC, T] scratch copy loop AND the weight GEMM
                    # (ct_ablate.py: 3.78 -> 3.06 ms/conv at L0 shapes; the
                    # MXU dots hide under the VPU compare/staging work, the
                    # copies did not).  w_ref is [K, C, CO] here.
                    ws = jax.lax.dot_general(  # [K, R, CO]
                        s_scratch[:], w_ref[:],
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ).astype(s_scratch.dtype)
                    owf = jax.lax.dot_general(  # [CO, T]
                        ws.reshape(k * window_r, -1),
                        oh_scratch[:].reshape(k * window_r, TILE_T),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(out_ref.dtype)
                    if rm:
                        out_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :] = owf.T
                    else:
                        out_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = owf
                    return
                if ct:
                    # Two-step CT (deep levels, C*CO too big for the
                    # per-tile premultiply): gather dot -> VALUE reshape
                    # [K,C,T] -> [KC,T] (free leading-dim merge, no
                    # scratch round-trip) -> one big [CO,KC]x[KC,T] GEMM.
                    gkt = jax.lax.dot_general(  # [K, C, T]
                        s_scratch[:], oh_scratch[:],
                        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ).astype(s_scratch.dtype).reshape(k * c, TILE_T)
                    o2s = jax.lax.dot_general(  # [CO, T]
                        w_ref[:], gkt,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(out_ref.dtype)
                    if rm:
                        out_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :] = o2s.T
                    else:
                        out_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = o2s
                    return
                if kc_pad > k * c:
                    g_scratch[:, k * c:] = jnp.zeros_like(
                        g_scratch[:, k * c:]
                    )
                gkt = jax.lax.dot_general(  # [K, T, C]
                    oh_scratch[:], s_scratch[:],
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(g_scratch.dtype)
                for kk in range(k):  # flat layout for the single big GEMM
                    g_scratch[:, kk * c: (kk + 1) * c] = gkt[kk]
                out_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :] = (
                    jax.lax.dot_general(
                        g_scratch[:], w_ref[:],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(out_ref.dtype)
                )
                return
            for kk in range(k):
                g, j = divmod(kk, g_off)
                start = pl.multiple_of(
                    start_ref[0, tile, _k_col(kk, kmap)], START_ALIGN
                )
                win = keys_ref[0, pl.ds(start, window_r), 0]  # [R] sublane
                oh_scratch[g, j * window_r:(j + 1) * window_r, :] = (
                    win[:, None] == qrow(kk)[None, :]
                ).astype(oh_scratch.dtype)
                s_scratch[
                    g, j * window_r:(j + 1) * window_r, j * c:(j + 1) * c
                ] = table_ref[0, pl.ds(start, window_r), :]
            acc = jnp.zeros((TILE_T, out_ref.shape[2]), jnp.float32)
            for g in range(n_groups):
                got = jax.lax.dot_general(  # [T, G*C]
                    oh_scratch[g], s_scratch[g],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(s_scratch.dtype)
                acc += jax.lax.dot_general(
                    got, w_ref[g * glanes:(g + 1) * glanes, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            out_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :] = acc.astype(
                out_ref.dtype
            )


def _gather_kernel(
    live_ref, keys_ref, table_ref, qk_ref, start_ref, g_ref,
    oh_scratch, s_scratch, *, k: int, c: int, window_r: int,
    dkeys: Tuple[int, ...], kmap: Tuple[int, ...] | None = None,
):
    """Variant emitting the gathered matrix g [T, K*C] (for dW)."""
    tile = pl.program_id(1)

    @pl.when(tile >= live_ref[pl.program_id(0), 0])
    def _dead():
        g_ref[0] = jnp.zeros(g_ref.shape[1:], g_ref.dtype)

    @pl.when(tile < live_ref[pl.program_id(0), 0])
    def _live():
        qrow = _q_rows(qk_ref, slice(0, TILE_T), k, dkeys, kmap)
        for kk in range(k):
            start = pl.multiple_of(
                start_ref[0, tile, _k_col(kk, kmap)], START_ALIGN
            )
            win = keys_ref[0, pl.ds(start, window_r), 0]
            oh_scratch[kk] = (
                win[:, None] == qrow(kk)[None, :]
            ).astype(oh_scratch.dtype)
            s_scratch[kk] = table_ref[0, pl.ds(start, window_r), :]
        gkt = jax.lax.dot_general(
            oh_scratch[:], s_scratch[:],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(g_ref.dtype)
        for kk in range(k):
            g_ref[0, :, kk * c: (kk + 1) * c] = gkt[kk]


def _bounded_queries(qmeta, start, q_bound, p):
    """Slice the query side to a static row bound (a multiple of P*T tiles).

    The static capacity is a budget, not the workload: with detector
    occupancies well under capacity, most query tiles are dead yet still pay
    the per-grid-step fixed cost.  ``q_bound`` (plan-level static) truncates
    the grid; rows past it are implicitly zero (the engine pads the output
    back and surfaces ``max(n_active - q_bound, 0)`` as a metric).

    ``qmeta`` is the packed [B, 1+nw, M] base-key + validity-mask array
    with queries in LANES, so the kernels read [T]-lane rows directly
    (no per-tile lane<->sublane transpose)."""
    m = qmeta.shape[2]
    if q_bound is None or q_bound >= m:
        return qmeta, start, m
    qb = _round_up(q_bound, TILE_T * p)
    if qb >= m:
        return qmeta, start, m
    return qmeta[:, :, :qb], start[:, : qb // TILE_T], qb


def _pad_lanes(x: jax.Array, n_to: int, fill) -> jax.Array:
    """Pad the LAST dim of [B, K, M] query keys to n_to."""
    n = x.shape[-1]
    if n == n_to:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, n_to - n)), constant_values=fill)


def window_conv_apply(
    keys: jax.Array,  # [B, N_in] sorted keys of the table site set
    feats: jax.Array,  # [B, N_in, C] table features
    qmeta: jax.Array,  # [B, 1+nw, M] packed query meta (base + mask words)
    start: jax.Array,  # [B, n_tiles, K] from window_plan
    w: jax.Array,  # [K, C, CO]
    q_active: jax.Array,  # i32[B] live rows on the query side
    dkeys: Tuple[int, ...],  # static per-offset key deltas (key_deltas)
    kmap: Tuple[int, ...] | None = None,  # static slot -> offset remap
    interpret: bool = False,
    window_r: int | None = None,
    q_bound: int | None = None,
) -> jax.Array:
    """-> [B, M, CO] in-window contributions (overflow pairs excluded)."""
    if window_r is None:  # resolve LIVE tuning, never the
        window_r = window_r_default()  # import-time snapshot
    b, _, m = qmeta.shape
    k = len(dkeys)
    c = feats.shape[-1]
    co = w.shape[-1]
    p = _tiles_per_step(k)
    qmeta, start, mb = _bounded_queries(qmeta, start, q_bound, p)
    pk, pt = _conv_table(keys, feats, window_r)
    npad = pk.shape[1]
    n_steps = _cdiv(mb, TILE_T * p)
    n_tiles = n_steps * p
    qk_p = _pad_lanes(qmeta, n_tiles * TILE_T, 0)
    if start.shape[1] < n_tiles:
        start = jnp.pad(start, ((0, 0), (0, n_tiles - start.shape[1]),
                                (0, 0)))
    g_off = _group_size(k, c)
    ct = g_off == 1 and _use_ct(c, co)
    wfuse = ct and c != 1 and _use_wfuse(k, c, co)
    n_groups = _cdiv(k, g_off)
    glanes = g_off * c
    kc_pad = _round_up(k * c, 128) if g_off == 1 else n_groups * glanes
    if wfuse:
        w2 = w.astype(feats.dtype)  # [K, C, CO] for the weight-fused dots
        w_spec = pl.BlockSpec((k, c, co), lambda bb, i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    elif ct and c != 1:
        # two-step CT: the gathered [K*C, T] is a dot-result value, so
        # the weight GEMM contracts the UNPADDED k*c (Mosaic zero-pads
        # contractions internally).
        w2 = w.reshape(k * c, co).astype(feats.dtype).transpose(1, 0)
        w_spec = pl.BlockSpec((co, k * c), lambda bb, i: (0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w2 = w.reshape(k * c, co).astype(feats.dtype)
        w2 = jnp.pad(w2, ((0, kc_pad - k * c), (0, 0)))
        if ct:
            w2 = w2.transpose(1, 0)  # [CO, KC_pad]
        w_spec = pl.BlockSpec((co, kc_pad) if ct else (kc_pad, co),
                              lambda bb, i: (0, 0), memory_space=pltpu.VMEM)
    live2 = _live_tiles(q_active, mb)[:, None]
    rm = ct and _rm_out()
    kern = functools.partial(
        _conv_kernel, k=k, c=c, kc_pad=kc_pad, window_r=window_r, p=p,
        dkeys=tuple(dkeys), kmap=None if kmap is None else tuple(kmap),
        ct=ct, wfuse=wfuse, rm=rm,
    )
    if g_off == 1:
        if ct and c == 1:
            scratch_shapes = [pltpu.VMEM((kc_pad, TILE_T), jnp.float32)]
        elif ct:
            scratch_shapes = [
                pltpu.VMEM((k, window_r, TILE_T), feats.dtype),
                pltpu.VMEM((k, window_r, c), feats.dtype),
            ]
        else:
            scratch_shapes = [
                pltpu.VMEM((TILE_T, kc_pad), feats.dtype),
                pltpu.VMEM((k, window_r, TILE_T), feats.dtype),
                pltpu.VMEM((k, window_r, c), feats.dtype),
            ]
    else:
        scratch_shapes = [
            pltpu.VMEM((n_groups, g_off * window_r, TILE_T), feats.dtype),
            pltpu.VMEM((n_groups, g_off * window_r, glanes), feats.dtype),
        ]
    if ct and not rm:
        out_spec = pl.BlockSpec((1, co, TILE_T * p), lambda bb, i: (bb, 0, i),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((b, co, n_tiles * TILE_T), feats.dtype)
    else:
        out_spec = pl.BlockSpec((1, TILE_T * p, co), lambda bb, i: (bb, i, 0),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((b, n_tiles * TILE_T, co), feats.dtype)
    out = pl.pallas_call(
        kern,
        grid=(b, n_steps),
        in_specs=[
            pl.BlockSpec(live2.shape, lambda bb, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, npad, 1), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qk_p.shape[1], TILE_T * p),
                         lambda bb, i: (bb, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, start.shape[1], k), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            w_spec,
        ],
        out_specs=out_spec,
        out_shape=out_sds,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(live2, pk[..., None], pt, qk_p, start, w2)
    if ct and not rm:
        out = out.transpose(0, 2, 1)
    out = out[:, :mb]
    if mb < m:
        out = _pad_rows(out, m, 0)
    return out


def _dw_kernel(
    live_ref,  # SMEM i32[B, 1]
    keys_ref,  # [1, Npad, 1] VMEM
    table_ref,  # [1, Npad, C] VMEM
    qk_ref,  # [1, 1+nw, P*T] VMEM (packed query meta)
    start_ref,  # [1, n_tiles, K] SMEM
    gy_ref,  # [1, P*T, CO] VMEM (output cotangent tiles)
    dw_ref,  # [KC_pad or Gn*GL, CO] f32 VMEM (accumulated over the grid)
    *scratch,  # G=1: (g [T, KC_pad], oh [K, R, T], s [K, R, C])
    #            G>1: (oh [Gn, G*R, T], s [Gn, G*R, G*C])
    k: int,
    c: int,
    kc_pad: int,
    window_r: int,
    p: int,
    dkeys: Tuple[int, ...],
    kmap: Tuple[int, ...] | None = None,
    ct: bool = False,
):
    """dW += g_tile^T @ gy_tile, fused with the window gather — no [B, M,
    K*C] materialization in HBM and no XLA einsum (the round-1/2 backward
    wrote ~700 MB of gathered rows per level-0 conv just to contract them
    immediately).  Same G=1 batched-K / G>1 block-diagonal split, multi-
    tile step, and ``ct`` lane-transposed orientation as _conv_kernel —
    with ct, gy arrives pre-transposed as [B, CO, M] and the accumulator
    is [CO, KC_pad] f32 with KC in the lanes."""
    step = pl.program_id(1)
    g_off = _group_size(k, c)
    n_groups = _cdiv(k, g_off)
    glanes = g_off * c
    first = (pl.program_id(0) == 0) & (step == 0)
    if g_off == 1:
        if ct and c == 1:
            g_scratch, = scratch
        else:
            g_scratch, oh_scratch, s_scratch = scratch

        @pl.when(first)
        def _zero1():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            if ct and kc_pad > k * c:
                g_scratch[k * c:, :] = jnp.zeros_like(g_scratch[k * c:, :])
    else:
        oh_scratch, s_scratch = scratch

        @pl.when(first)
        def _zero():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            s_scratch[...] = jnp.zeros_like(s_scratch)
            oh_scratch[...] = jnp.zeros_like(oh_scratch)

    for pp in range(p):
        tile = step * p + pp

        @pl.when(tile < live_ref[pl.program_id(0), 0])
        def _live(pp=pp, tile=tile):
            qrow = _q_rows(
                qk_ref, slice(pp * TILE_T, (pp + 1) * TILE_T), k, dkeys, kmap
            )
            if g_off == 1:
                if ct and c == 1:
                    # C=1 select-gather (see _conv_kernel)
                    for kk in range(k):
                        start = pl.multiple_of(
                            start_ref[0, tile, _k_col(kk, kmap)], START_ALIGN
                        )
                        win = keys_ref[0, pl.ds(start, window_r), 0]
                        xw = table_ref[0, pl.ds(start, window_r), 0].astype(
                            jnp.float32
                        )
                        oh = win[:, None] == qrow(kk)[None, :]
                        g_scratch[kk, :] = jnp.sum(
                            jnp.where(oh, xw[:, None], 0.0), axis=0
                        )
                    gy_ct1 = gy_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T]
                    dw_ref[...] += jax.lax.dot_general(
                        gy_ct1, g_scratch[:].astype(gy_ct1.dtype),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [CO, KC_pad] f32
                    return
                for kk in range(k):
                    start = pl.multiple_of(
                        start_ref[0, tile, _k_col(kk, kmap)], START_ALIGN
                    )
                    win = keys_ref[0, pl.ds(start, window_r), 0]
                    oh_scratch[kk] = (
                        win[:, None] == qrow(kk)[None, :]
                    ).astype(oh_scratch.dtype)
                    s_scratch[kk] = table_ref[0, pl.ds(start, window_r), :]
                if ct:
                    gy_ct = gy_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T]
                    gkt = jax.lax.dot_general(  # [K, C, T]
                        s_scratch[:], oh_scratch[:],
                        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ).astype(g_scratch.dtype)
                    for kk in range(k):
                        g_scratch[kk * c: (kk + 1) * c, :] = gkt[kk]
                    dw_ref[...] += jax.lax.dot_general(
                        gy_ct, g_scratch[:],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [CO, KC_pad] f32
                    return
                gy_t = gy_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :]
                if kc_pad > k * c:
                    g_scratch[:, k * c:] = jnp.zeros_like(
                        g_scratch[:, k * c:]
                    )
                gkt = jax.lax.dot_general(  # [K, T, C]
                    oh_scratch[:], s_scratch[:],
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(g_scratch.dtype)
                for kk in range(k):
                    g_scratch[:, kk * c: (kk + 1) * c] = gkt[kk]
                dw_ref[...] += jax.lax.dot_general(
                    g_scratch[:], gy_t,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [KC_pad, CO] f32
                return
            gy_t = gy_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :]
            for kk in range(k):
                g, j = divmod(kk, g_off)
                start = pl.multiple_of(
                    start_ref[0, tile, _k_col(kk, kmap)], START_ALIGN
                )
                win = keys_ref[0, pl.ds(start, window_r), 0]
                oh_scratch[g, j * window_r:(j + 1) * window_r, :] = (
                    win[:, None] == qrow(kk)[None, :]
                ).astype(oh_scratch.dtype)
                s_scratch[
                    g, j * window_r:(j + 1) * window_r, j * c:(j + 1) * c
                ] = table_ref[0, pl.ds(start, window_r), :]
            for g in range(n_groups):
                got = jax.lax.dot_general(  # [T, G*C]
                    oh_scratch[g], s_scratch[g],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(s_scratch.dtype)
                dw_ref[g * glanes:(g + 1) * glanes, :] += (
                    jax.lax.dot_general(
                        got, gy_t,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )  # [GL, CO] f32


def window_dw(
    keys: jax.Array,  # [B, N_in] table keys
    feats: jax.Array,  # [B, N_in, C] table features
    qmeta: jax.Array,  # [B, 1+nw, M] packed query meta
    start: jax.Array,  # [B, n_tiles, K]
    gy: jax.Array,  # [B, M, CO] output cotangent
    q_active: jax.Array,
    dkeys: Tuple[int, ...],
    kmap: Tuple[int, ...] | None = None,
    interpret: bool = False,
    window_r: int | None = None,
    q_bound: int | None = None,
) -> jax.Array:
    """-> dW f32[K, C, CO] = sum over pairs of x[src] (x) gy[dst] for the
    in-window pairs of the plan."""
    if window_r is None:  # resolve LIVE tuning, never the
        window_r = window_r_default()  # import-time snapshot
    b, _, m = qmeta.shape
    k = len(dkeys)
    c = feats.shape[-1]
    co = gy.shape[-1]
    p = _tiles_per_step(k)
    qmeta, start, mb = _bounded_queries(qmeta, start, q_bound, p)
    gy = gy[:, :mb]
    pk, pt = _conv_table(keys, feats, window_r)
    npad = pk.shape[1]
    n_steps = _cdiv(mb, TILE_T * p)
    n_tiles = n_steps * p
    qk_p = _pad_lanes(qmeta, n_tiles * TILE_T, 0)
    gy_p = _pad_rows(gy, n_tiles * TILE_T, 0)
    if start.shape[1] < n_tiles:
        start = jnp.pad(start, ((0, 0), (0, n_tiles - start.shape[1]),
                                (0, 0)))
    g_off = _group_size(k, c)
    ct = g_off == 1 and _use_ct(c, co)
    n_groups = _cdiv(k, g_off)
    glanes = g_off * c
    kc_pad = _round_up(k * c, 128) if g_off == 1 else n_groups * glanes
    live2 = _live_tiles(q_active, mb)[:, None]
    kern = functools.partial(
        _dw_kernel, k=k, c=c, kc_pad=kc_pad, window_r=window_r, p=p,
        dkeys=tuple(dkeys), kmap=None if kmap is None else tuple(kmap),
        ct=ct,
    )
    if g_off == 1:
        if ct and c == 1:
            scratch_shapes = [pltpu.VMEM((kc_pad, TILE_T), jnp.float32)]
        else:
            scratch_shapes = [
                pltpu.VMEM((kc_pad, TILE_T) if ct else (TILE_T, kc_pad),
                           feats.dtype),
                pltpu.VMEM((k, window_r, TILE_T), feats.dtype),
                pltpu.VMEM((k, window_r, c), feats.dtype),
            ]
    else:
        scratch_shapes = [
            pltpu.VMEM((n_groups, g_off * window_r, TILE_T), feats.dtype),
            pltpu.VMEM((n_groups, g_off * window_r, glanes), feats.dtype),
        ]
    if ct:
        gy_p = gy_p.transpose(0, 2, 1)  # [B, CO, M] — one XLA transpose
        gy_spec = pl.BlockSpec((1, co, TILE_T * p), lambda bb, i: (bb, 0, i),
                               memory_space=pltpu.VMEM)
        dw_spec = pl.BlockSpec((co, kc_pad), lambda bb, i: (0, 0),
                               memory_space=pltpu.VMEM)
        dw_sds = jax.ShapeDtypeStruct((co, kc_pad), jnp.float32)
    else:
        gy_spec = pl.BlockSpec((1, TILE_T * p, co), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM)
        dw_spec = pl.BlockSpec((kc_pad, co), lambda bb, i: (0, 0),
                               memory_space=pltpu.VMEM)
        dw_sds = jax.ShapeDtypeStruct((kc_pad, co), jnp.float32)
    dw = pl.pallas_call(
        kern,
        grid=(b, n_steps),
        in_specs=[
            pl.BlockSpec(live2.shape, lambda bb, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, npad, 1), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qk_p.shape[1], TILE_T * p),
                         lambda bb, i: (bb, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, start.shape[1], k), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            gy_spec,
        ],
        out_specs=dw_spec,
        out_shape=dw_sds,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(live2, pk[..., None], pt, qk_p, start, gy_p)
    if ct:
        dw = dw.transpose(1, 0)
    return dw[: k * c].reshape(k, c, co)


def window_bwd_subm(
    keys: jax.Array,  # [B, N] sorted site keys (shared by x and gy)
    feats: jax.Array,  # [B, N, C] forward input
    gy: jax.Array,  # [B, N, CO] output cotangent
    qmeta: jax.Array,  # [B, 1+nw, M] forward plan query meta
    start: jax.Array,  # [B, n_tiles, K] forward plan starts
    w: jax.Array,  # [K, C, CO]
    q_active: jax.Array,
    perm: np.ndarray,  # mirror permutation of the offsets (static)
    dkeys: Tuple[int, ...] = (),
    interpret: bool = False,
    window_r: int | None = None,
    q_bound: int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused submanifold backward: dX AND dW from ONE gy gather.

    For a submanifold conv the output sites equal the input sites, so
    BOTH cotangents only need gy gathered through the FORWARD plan's
    windows (pair mirror: the forward pair (i <- j, k) is the twin of
    (j <- i, perm[k])):

        dX[t] = sum_k W[perm[k]]^T gy[n(t, k)]
        dW[perm[k], c, o] = sum_t x[t, c] * gy[n(t, k), o]

    which is exactly the strided backward kernel evaluated on the
    forward plan with perm-permuted weights — one compare pass, one
    [K, R, CO] gy staging, no x-window staging at all (x enters only as
    the lane-transposed [C, T] query-side tile).  The returned dw is the
    in-window part of dW indexed by perm[k]; the caller adds the
    twin-complement sidecar in the same mirrored index space and applies
    the final [perm] reorder (an involution for centered kernels).

    -> (dx [B, M, C], dw_mirror f32 [K, C, CO]; dW = (dw_mirror + twin
    sidecar)[perm])."""
    if window_r is None:  # resolve LIVE tuning, never the
        window_r = window_r_default()  # import-time snapshot
    return window_bwd_strided(
        keys, gy, feats, qmeta, start, jnp.asarray(w)[np.asarray(perm)],
        q_active, dkeys=dkeys, interpret=interpret, window_r=window_r,
        q_bound=q_bound,
    )


def _bwd_strided_kernel(
    live_ref,  # SMEM i32[B, 1]
    keys_ref,  # [1, Npad, 1] VMEM (OUTPUT site keys)
    gyt_ref,  # [1, Npad, CO] VMEM (gy table over output sites)
    qk_ref,  # [1, 1+nw, P*T] VMEM (reverse plan query meta per INPUT site)
    start_ref,  # [1, n_tiles, K] SMEM
    wdx_ref,  # [C, K*CO] VMEM
    x_ref,  # rm: [1, P*T, C] x tiles (row-major); else [1, C, P*T] (CT)
    dx_ref,  # rm: [1, P*T, C] VMEM out; else [1, C, P*T]
    dw_ref,  # [K*CO, C] f32 VMEM out (accumulated; [K, CO, C] order)
    oh_s,  # [K, R, T]
    sgy_s,  # [K, R, CO]
    *,
    k: int,
    c: int,
    co: int,
    window_r: int,
    p: int,
    dkeys: Tuple[int, ...],
    kmap: Tuple[int, ...] | None = None,
    rm: bool = False,
):
    """Fused strided backward: dX AND dW from ONE gather of gy.

    The strided bwd's dX and dW BOTH walk the REVERSE plan over the same
    gy table (window_engine._strided_bwd) — the unfused path staged the
    identical [K, R, CO] windows and built the identical one-hots twice.
    Here: gather gy once; dX_ct = W_dx @ ggy; dW[k, co, c] += ggy x_ct.

    The gathered [K, CO, T] feeds both consumers through a VALUE reshape
    to [K*CO, T] — NOT a scratch round-trip: the old [KCO_pad, T] scratch
    copy loop (K stores of [CO, T]) cost ~1.2 ms/conv at L0 shapes and
    made each backward launch ~1.6x its forward (trace r2: 3.13 vs 1.92
    ms).  Mosaic merges leading dims of a dot result for free (the same
    pattern as the weight-fused forward's ws.reshape)."""
    step = pl.program_id(1)
    first = (pl.program_id(0) == 0) & (step == 0)

    @pl.when(first)
    def _zero():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for pp in range(p):
        tile = step * p + pp

        @pl.when(tile >= live_ref[pl.program_id(0), 0])
        def _dead(pp=pp):
            if rm:
                dx_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :] = jnp.zeros(
                    (TILE_T, dx_ref.shape[2]), dx_ref.dtype
                )
            else:
                dx_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = jnp.zeros(
                    (dx_ref.shape[1], TILE_T), dx_ref.dtype
                )

        @pl.when(tile < live_ref[pl.program_id(0), 0])
        def _live(pp=pp, tile=tile):
            qrow = _q_rows(
                qk_ref, slice(pp * TILE_T, (pp + 1) * TILE_T), k, dkeys, kmap
            )
            for kk in range(k):
                start = pl.multiple_of(
                    start_ref[0, tile, _k_col(kk, kmap)], START_ALIGN
                )
                win = keys_ref[0, pl.ds(start, window_r), 0]
                oh_s[kk] = (
                    win[:, None] == qrow(kk)[None, :]
                ).astype(oh_s.dtype)
                sgy_s[kk] = gyt_ref[0, pl.ds(start, window_r), :]
            ggy = jax.lax.dot_general(  # [K, CO, T]
                sgy_s[:], oh_s[:],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(sgy_s.dtype).reshape(k * co, TILE_T)
            dxv = jax.lax.dot_general(  # [C, T]
                wdx_ref[:], ggy,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dx_ref.dtype)
            if rm:
                dx_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :] = dxv.T
                x_t = x_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :]  # [T, C]
                dw_ref[...] += jax.lax.dot_general(  # [K*CO, C]
                    ggy, x_t,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                dx_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = dxv
                x_ct = x_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T]
                dw_ref[...] += jax.lax.dot_general(  # [K*CO, C]
                    ggy, x_ct,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )


def window_bwd_strided(
    keys_out: jax.Array,  # [B, N_out] output-site keys
    gy: jax.Array,  # [B, N_out, CO] output cotangent
    feats: jax.Array,  # [B, N_in, C] forward input
    rq: jax.Array,  # [B, 1+nw, N_in] reverse plan query meta
    rs: jax.Array,  # [B, n_tiles, K] reverse plan starts
    w: jax.Array,  # [K, C, CO]
    r_active: jax.Array,
    dkeys: Tuple[int, ...] = (),
    kmap: Tuple[int, ...] | None = None,
    interpret: bool = False,
    window_r: int | None = None,  # None -> window_r_strided()
    q_bound: int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """-> (dx [B, N_in, C], dw f32 [K, C, CO]) for the rev-plan pair set."""
    if window_r is None:  # resolve LIVE tuning, never the
        window_r = window_r_strided()  # import-time snapshot
    b, _, m = rq.shape
    k = len(dkeys)
    c = feats.shape[-1]
    co = gy.shape[-1]
    p = _tiles_per_step(k)
    rq_b, rs_b, mb = _bounded_queries(rq, rs, q_bound, p)
    pk, pgy = _conv_table(keys_out, gy, window_r)
    npad = pk.shape[1]
    n_steps = _cdiv(mb, TILE_T * p)
    n_tiles = n_steps * p
    qk_p = _pad_lanes(rq_b, n_tiles * TILE_T, 0)
    rm = _rm_out()
    x_in = _pad_rows(feats[:, :mb], n_tiles * TILE_T, 0)
    if not rm:
        x_in = x_in.transpose(0, 2, 1)
    if rs_b.shape[1] < n_tiles:
        rs_b = jnp.pad(rs_b, ((0, 0), (0, n_tiles - rs_b.shape[1]), (0, 0)))
    # K*CO stays unpadded: Mosaic pads dot contractions internally with
    # zeros, and the dw accumulator only needs sublane (8) alignment,
    # which C, CO % 16 == 0 guarantees.
    kco = k * co
    wdx = w.transpose(1, 0, 2).reshape(c, kco).astype(feats.dtype)
    live2 = _live_tiles(r_active, mb)[:, None]
    kern = functools.partial(
        _bwd_strided_kernel, k=k, c=c, co=co, window_r=window_r, p=p,
        dkeys=tuple(dkeys), kmap=None if kmap is None else tuple(kmap),
        rm=rm,
    )
    if rm:
        x_spec = pl.BlockSpec((1, TILE_T * p, c), lambda bb, i: (bb, i, 0),
                              memory_space=pltpu.VMEM)
        dx_spec = pl.BlockSpec((1, TILE_T * p, c), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM)
        dx_sds = jax.ShapeDtypeStruct((b, n_tiles * TILE_T, c), feats.dtype)
    else:
        x_spec = pl.BlockSpec((1, c, TILE_T * p), lambda bb, i: (bb, 0, i),
                              memory_space=pltpu.VMEM)
        dx_spec = pl.BlockSpec((1, c, TILE_T * p), lambda bb, i: (bb, 0, i),
                               memory_space=pltpu.VMEM)
        dx_sds = jax.ShapeDtypeStruct((b, c, n_tiles * TILE_T), feats.dtype)
    dx, dw = pl.pallas_call(
        kern,
        grid=(b, n_steps),
        in_specs=[
            pl.BlockSpec(live2.shape, lambda bb, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, npad, 1), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, co), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qk_p.shape[1], TILE_T * p),
                         lambda bb, i: (bb, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rs_b.shape[1], k), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((c, kco), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=(
            dx_spec,
            pl.BlockSpec((kco, c), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            dx_sds,
            jax.ShapeDtypeStruct((kco, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((k, window_r, TILE_T), feats.dtype),
            pltpu.VMEM((k, window_r, co), feats.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(live2, pk[..., None], pgy, qk_p, rs_b, wdx, x_in)
    if not rm:
        dx = dx.transpose(0, 2, 1)
    dx = dx[:, :mb]
    if mb < m:
        dx = _pad_rows(dx, m, 0)
    dw = dw.reshape(k, co, c).transpose(0, 2, 1)
    return dx, dw


def window_gather(
    keys: jax.Array,
    feats: jax.Array,
    qmeta: jax.Array,
    start: jax.Array,
    q_active: jax.Array,
    dkeys: Tuple[int, ...] = (),
    kmap: Tuple[int, ...] | None = None,
    interpret: bool = False,
    window_r: int | None = None,
) -> jax.Array:
    """-> g [B, M, K*C]: the gathered neighbor matrix (for dW)."""
    if window_r is None:  # resolve LIVE tuning, never the
        window_r = window_r_default()  # import-time snapshot
    b, _, m = qmeta.shape
    k = len(dkeys)
    c = feats.shape[-1]
    pk, pt = _conv_table(keys, feats, window_r)
    npad = pk.shape[1]
    n_tiles = _cdiv(m, TILE_T)
    qk_p = _pad_lanes(qmeta, n_tiles * TILE_T, 0)
    live2 = _live_tiles(q_active, m)[:, None]
    kern = functools.partial(
        _gather_kernel, k=k, c=c, window_r=window_r, dkeys=tuple(dkeys),
        kmap=None if kmap is None else tuple(kmap),
    )
    g = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(live2.shape, lambda bb, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, npad, 1), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qk_p.shape[1], TILE_T), lambda bb, i: (bb, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, start.shape[1], k), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, k * c), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * TILE_T, k * c), feats.dtype),
        scratch_shapes=[
            pltpu.VMEM((k, window_r, TILE_T), feats.dtype),
            pltpu.VMEM((k, window_r, c), feats.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(live2, pk[..., None], pt, qk_p, start)
    return g[:, :m]


# --------------------------------------------------------------------------
# Overflow sidecar kernels: apply the compacted out-of-window pair lists.
#
# The XLA formulation (gather rows + one-hot einsum + vmapped scatter-add)
# compiles pathologically slowly on TPU (~20 s per apply, superlinear in
# module size) and was implicated in worker crashes inside jax.grad modules.
# Here the pair list (a few thousand entries) is walked with a fori_loop of
# dynamic-row VMEM reads/writes — tiny IR, seconds to compile, ~0.1-0.3 ms
# to run.  The XLA twins in window_engine remain the interpret-mode path.
# --------------------------------------------------------------------------

# Mosaic cannot prove arbitrary dynamic sublane offsets are tile-aligned, so
# single-row loads/stores go through an aligned 8-row block with a one-hot
# row select (ROW_BLK rows of extra VPU work per sidecar entry — trivial).
ROW_BLK = 8


def _row_load(ref, idx, width):
    """ref[0, idx:idx+1, :] for arbitrary dynamic idx (width-lane rows).

    The select runs in f32: Mosaic cannot relayout an i1 mask produced on
    (8,128) tiles onto bf16 (16,128) tiles, so the block is cast BEFORE the
    mask applies."""
    base = pl.multiple_of((idx // ROW_BLK) * ROW_BLK, ROW_BLK)
    blk = ref[0, pl.ds(base, ROW_BLK), :].astype(jnp.float32)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, width), 0)
        == idx - base
    )
    return jnp.sum(
        jnp.where(sel, blk, 0.0), axis=0, keepdims=True
    )  # [1, width] f32


def _row_accum(ref, idx, contrib):
    """ref[0, idx, :] += contrib[0, :] for arbitrary dynamic idx (f32 math,
    see _row_load for the mask-relayout constraint)."""
    base = pl.multiple_of((idx // ROW_BLK) * ROW_BLK, ROW_BLK)
    blk = ref[0, pl.ds(base, ROW_BLK), :]
    blk32 = blk.astype(jnp.float32)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, blk32.shape, 0) == idx - base
    )
    out = blk32 + jnp.where(sel, contrib.astype(jnp.float32), 0.0)
    ref[0, pl.ds(base, ROW_BLK), :] = out.astype(blk.dtype)


def _row_load2(ref, idx, width):
    """ref[idx:idx+1, :] (2D ref) for arbitrary dynamic idx."""
    base = pl.multiple_of((idx // ROW_BLK) * ROW_BLK, ROW_BLK)
    blk = ref[pl.ds(base, ROW_BLK), :].astype(jnp.float32)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, width), 0)
        == idx - base
    )
    return jnp.sum(jnp.where(sel, blk, 0.0), axis=0, keepdims=True)


def _ov_bound(valid: jax.Array) -> jax.Array:
    """i32[B] — last-valid-index + 1 per batch element.

    The sidecar fori_loops are bounded by this DYNAMIC count instead of the
    static cap, so raising caps (exactness headroom for smaller WINDOW_R)
    costs nothing at runtime when the actual overflow stays small.  The
    host-built lists are prefix-compacted; the device fallback
    (_compact_overflow) can leave invalid holes mid-prefix (uncovered
    candidates with no table match), hence last-index+1 rather than a
    popcount — the per-entry valid guard inside the kernels still applies."""
    v = valid.astype(jnp.int32)
    s = v.shape[1]
    last = s - jnp.argmax(v[:, ::-1], axis=1)
    return jnp.where(jnp.any(v != 0, axis=1), last, 0).astype(jnp.int32)


def _ov_apply_kernel(
    n_ref,  # SMEM i32[B, 1] dynamic pair-list bound per batch element
    src_ref,  # SMEM i32[1, 1, S] (this batch element's pair list)
    dst_ref,  # SMEM i32[1, 1, S]
    kk_ref,  # SMEM i32[1, 1, S]
    valid_ref,  # SMEM i32[1, 1, S]
    base_ref,  # [1, M, CO] VMEM (conv output to accumulate onto)
    table_ref,  # [1, Npad, C] VMEM
    w_ref,  # [K*C, CO] VMEM (row-blocked per offset)
    out_ref,  # [1, M, CO] VMEM
    *,
    s_cap: int,
    c: int,
):
    out_ref[0] = base_ref[0]
    co = w_ref.shape[1]

    def body(s, _):
        @pl.when(valid_ref[0, 0, s] != 0)
        def _():
            row = _row_load(table_ref, src_ref[0, 0, s], c)  # [1, C] f32
            kk = kk_ref[0, 0, s]
            if c % ROW_BLK == 0:
                wk = w_ref[
                    pl.ds(pl.multiple_of(kk * c, ROW_BLK), c), :
                ].astype(jnp.float32)  # [C, CO]
                contrib = jax.lax.dot_general(
                    row, wk, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif c == 1:
                wk = _row_load2(w_ref, kk, co)  # [1, CO] f32
                contrib = row[:, :1] * wk
            else:
                raise NotImplementedError(
                    f"sidecar kernel needs C==1 or C%{ROW_BLK}==0, got {c}"
                )
            _row_accum(out_ref, dst_ref[0, 0, s], contrib)

        return 0

    n = jnp.minimum(n_ref[pl.program_id(0), 0], s_cap)
    jax.lax.fori_loop(0, n, body, 0)


def overflow_apply(
    base: jax.Array,  # [B, M, CO] conv output
    table: jax.Array,  # [B, N, C] table features
    w: jax.Array,  # [K, C, CO]
    src: jax.Array,  # i32[B, S]
    dst: jax.Array,  # i32[B, S]
    kk: jax.Array,  # i32[B, S]
    valid: jax.Array,  # bool[B, S]
) -> jax.Array:
    """base[b, dst] += W[kk] @ table[b, src] over valid pairs (Pallas)."""
    b, m, co = base.shape
    k, c, _ = w.shape
    s_cap = src.shape[1]
    npad = _round_up(table.shape[1], 8)
    pt = _pad_rows(table, npad, 0)
    kc_pad = _round_up(k * c, 8)  # row-block selects must stay in bounds
    w2 = w.reshape(k * c, co).astype(table.dtype)
    w2 = jnp.pad(w2, ((0, kc_pad - k * c), (0, 0)))
    kern = functools.partial(_ov_apply_kernel, s_cap=s_cap, c=c)
    sspec = pl.BlockSpec((1, 1, s_cap), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.SMEM)
    nb = _ov_bound(valid)[:, None]
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(nb.shape, lambda bb: (0, 0),
                         memory_space=pltpu.SMEM),
            sspec,
            sspec,
            sspec,
            sspec,
            pl.BlockSpec((1, m, co), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc_pad, co), lambda bb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, co), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, co), base.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(nb, src[:, None], dst[:, None], kk[:, None],
      valid.astype(jnp.int32)[:, None], base, pt, w2)


def _ov_dw_kernel(
    n_ref,  # SMEM i32[B, 1] dynamic pair-list bound
    src_ref, dst_ref, kk_ref, valid_ref,  # SMEM i32[1, 1, S]
    x_ref,  # [1, Npad, C] VMEM
    gy_ref,  # [1, Mpad, CO] VMEM
    dw_ref,  # [K*C, CO] f32 VMEM (accumulated across the batch grid)
    *,
    s_cap: int,
    c: int,
):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    def body(s, _):
        @pl.when(valid_ref[0, 0, s] != 0)
        def _():
            x = _row_load(x_ref, src_ref[0, 0, s], c)  # [1, C] f32
            gy = _row_load(gy_ref, dst_ref[0, 0, s], gy_ref.shape[2])  # [1, CO]
            outer = jax.lax.dot_general(
                x.transpose(1, 0), gy,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [C, CO]
            kk = kk_ref[0, 0, s]
            if c % ROW_BLK == 0:
                r = pl.ds(pl.multiple_of(kk * c, ROW_BLK), c)
                dw_ref[r, :] += outer
            elif c == 1:
                base = pl.multiple_of((kk // ROW_BLK) * ROW_BLK, ROW_BLK)
                blk = dw_ref[pl.ds(base, ROW_BLK), :]
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
                    == kk - base
                )
                dw_ref[pl.ds(base, ROW_BLK), :] = blk + jnp.where(
                    sel, outer, 0
                )
            else:
                raise NotImplementedError(
                    f"sidecar kernel needs C==1 or C%{ROW_BLK}==0, got {c}"
                )

        return 0

    n = jnp.minimum(n_ref[pl.program_id(0), 0], s_cap)
    jax.lax.fori_loop(0, n, body, 0)


def overflow_dw(
    x: jax.Array,  # [B, N, C] table features
    gy: jax.Array,  # [B, M, CO] output cotangent
    k: int,
    src: jax.Array,
    dst: jax.Array,
    kk: jax.Array,
    valid: jax.Array,
) -> jax.Array:
    """dW[kk] += x[src] (x) gy[dst] over valid pairs -> f32[K, C, CO]."""
    b, _, c = x.shape
    co = gy.shape[-1]
    s_cap = src.shape[1]
    xp = _pad_rows(x, _round_up(x.shape[1], 8), 0)
    gp = _pad_rows(gy, _round_up(gy.shape[1], 8), 0)
    kc_pad = _round_up(k * c, 8)
    kern = functools.partial(_ov_dw_kernel, s_cap=s_cap, c=c)
    sspec = pl.BlockSpec((1, 1, s_cap), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.SMEM)
    nb = _ov_bound(valid)[:, None]
    dw = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(nb.shape, lambda bb: (0, 0),
                         memory_space=pltpu.SMEM),
            sspec,
            sspec,
            sspec,
            sspec,
            pl.BlockSpec((1, xp.shape[1], c), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gp.shape[1], co), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kc_pad, co), lambda bb: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kc_pad, co), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(nb, src[:, None], dst[:, None], kk[:, None],
      valid.astype(jnp.int32)[:, None], xp, gp)
    return dw[: k * c].reshape(k, c, co)
