"""Batched overflow-sidecar kernels (one-hot GEMM gather/scatter).

The v1 sidecars (window_conv.overflow_apply / overflow_dw) walk the
compacted out-of-window pair list with a serial ``fori_loop`` of
single-row VMEM reads/writes — ~0.27 us per entry on v5e.  At bench
occupancies (a few hundred entries per plan) that serial walk costs more
than the windowed conv kernels it supplements: trace r2 attributed
~42 ms/step (16%) to sidecar launches, and it is the reason WINDOW_R
cannot shrink further (smaller windows push more pairs into the sidecar).

These v2 kernels process entries 128 at a time with the same one-hot
trick the window kernels use, replacing per-entry row arithmetic with
batched VPU compares + MXU dots:

  gather   Xg[s, c]   = sum_n (n == src[s]) * x[n, c]       (scan N chunks)
  expand   A[s, k*C+c] = (kk[s] == k) * Xg[s, c]
  apply    contrib     = A @ W_flat                           [S, CO]
  scatter  out[n, :]  += sum_s (n == dst[s]) * contrib[s]    (scan M chunks)
  dW       dw         += A^T @ Gg       (Gg = gather of gy[dst])

Work scales as (live S chunks) x (table rows / 512) compare+dot pairs —
tens of microseconds at bench shapes vs hundreds for the serial walk —
and stays exact for any pair list (duplicate dst rows accumulate through
the scatter dot).  The serial kernels remain for C == 1 (the 5^d initial
conv, whose one-lane dots would waste the MXU) and as the
``SEID_SIDECAR=serial`` bisect path.

Reference provenance: these implement the out-of-rulebook remainder of
SCN's gather-GEMM-scatter convolution (sparseconvnet C++ rulebook apply);
the reference resolves every pair through hash tables instead
(/root/reference/src/networks/sparse_building_blocks.py:18-57 via scn).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_CHUNK = 128  # entries per batch (lane dim of the one-hot compares)
N_CHUNK = 512  # table rows per gather/scatter scan step

# v5e/v4 cores have 128 MiB of VMEM.  These kernels hold full-capacity
# [rows, C] blocks whose lane dim pads to 128 (C=32 wastes 4x), double
# buffered across the batch grid — at dune2d level-0 capacity (60416
# rows) that is ~104 MB, which is why the limit is not the old 100 MB
# default.  Geometries whose estimate exceeds _VMEM_CAP are routed to
# the serial v1 sidecars by the engine (batched_*_fits below).
_VMEM_CAP = 126 * 1024 * 1024
_VMEM_MARGIN = 8 * 1024 * 1024  # estimate ran ~1 MB over measured; pad it


def _vmem_limit_for(est: int) -> int:
    return min(_VMEM_CAP, max(100 * 1024 * 1024, est + _VMEM_MARGIN))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _blk_bytes(rows: int, width: int, itemsize: int) -> int:
    """VMEM bytes of a [rows, width] block ((8, 128) tile padding)."""
    return _round_up(rows, 8) * _round_up(width, 128) * itemsize


def _apply_vmem_bytes(b, m, n, c, co, k, s, itemsize) -> int:
    """Conservative scoped-VMEM estimate for overflow_apply_batched
    (measured 103.47 MB vs estimate 104.6 MB at b8/m=n=60416/c=co=32/
    k=9/s=10112 bf16)."""
    del b
    mpad, npad = _round_up(m, N_CHUNK), _round_up(n, N_CHUNK)
    s_pad = _round_up(s, S_CHUNK)
    n_sc_pad = _round_up(s_pad // S_CHUNK, 8)
    per_step = (
        2 * _blk_bytes(n_sc_pad, S_CHUNK, 4)      # srcl + dstl
        + _blk_bytes(s_pad, 1, 4)                 # kkt (sublane-major)
        + 2 * _blk_bytes(mpad, co, itemsize)      # base + out
        + _blk_bytes(npad, c, itemsize)           # table
        + _blk_bytes(k * c, co, itemsize)         # w
    )
    scratch = (
        _blk_bytes(S_CHUNK, c, 4)
        + _blk_bytes(S_CHUNK, k * c, itemsize)
        + _blk_bytes(s_pad, co, 4)
    )
    return 2 * per_step + scratch  # x2: grid double buffering


def _dw_vmem_bytes(b, m, n, c, co, k, s, itemsize) -> int:
    del b
    mpad, npad = _round_up(m, N_CHUNK), _round_up(n, N_CHUNK)
    s_pad = _round_up(s, S_CHUNK)
    n_sc_pad = _round_up(s_pad // S_CHUNK, 8)
    per_step = (
        2 * _blk_bytes(n_sc_pad, S_CHUNK, 4)
        + _blk_bytes(s_pad, 1, 4)
        + _blk_bytes(npad, c, itemsize)           # x
        + _blk_bytes(mpad, co, itemsize)          # gy
        + _blk_bytes(k * c, co, 4)                # dw out (f32)
    )
    scratch = (
        _blk_bytes(S_CHUNK, c, 4)
        + _blk_bytes(S_CHUNK, co, 4)
        + _blk_bytes(S_CHUNK, k * c, itemsize)
    )
    return 2 * per_step + scratch


def batched_apply_fits(base, table, w, src) -> bool:
    """True if overflow_apply_batched's geometry fits scoped VMEM."""
    b, m, co = base.shape
    n, c = table.shape[1], table.shape[2]
    return _apply_vmem_bytes(
        b, m, n, c, co, w.shape[0], src.shape[1], table.dtype.itemsize
    ) + _VMEM_MARGIN <= _VMEM_CAP


def batched_dw_fits(x, gy, k, src) -> bool:
    b, n, c = x.shape
    m, co = gy.shape[1], gy.shape[2]
    return _dw_vmem_bytes(
        b, m, n, c, co, k, src.shape[1], x.dtype.itemsize
    ) + _VMEM_MARGIN <= _VMEM_CAP


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_rows(x: jax.Array, n_to: int, fill) -> jax.Array:
    n = x.shape[1]
    if n == n_to:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, n_to - n)
    return jnp.pad(x, pad, constant_values=fill)


def _lane_chunks(v: jax.Array, valid: jax.Array, s_pad: int) -> jax.Array:
    """[B, S] -> [B, n_sc_pad, 128] lane-vector chunks (invalid -> -1)."""
    b = v.shape[0]
    vm = jnp.where(valid, v, -1)
    vm = _pad_rows(vm, s_pad, -1)
    n_sc = s_pad // S_CHUNK
    vm = vm.reshape(b, n_sc, S_CHUNK)
    return _pad_rows(vm, _round_up(n_sc, 8), -1)


def _row_of(ref, idx):
    """ref[0, idx, :] for small sublane-major [1, R, 128] refs (iota select)."""
    blk = ref[0]
    sel = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0) == idx
    return jnp.sum(jnp.where(sel, blk, 0), axis=0, keepdims=True)  # [1, 128]


def _live_chunks(n_ref, b):
    return (n_ref[b, 0] + S_CHUNK - 1) // S_CHUNK


def _gather_chunk(table_ref, sel_row, vmask, nc, acc_ref):
    """acc[s, c] = sum_n (n == sel_row[s]) * table[n, c] over nc chunks."""
    acc_ref[...] = jnp.zeros_like(acc_ref)
    width = table_ref.shape[2]

    def body(i, _):
        base = pl.multiple_of(i * N_CHUNK, N_CHUNK)
        xt = table_ref[0, pl.ds(base, N_CHUNK), :]  # [N_CHUNK, width]
        keys = (
            jax.lax.broadcasted_iota(jnp.int32, (N_CHUNK, S_CHUNK), 0) + base
        )
        oh = ((keys == sel_row) & vmask).astype(xt.dtype)  # [N_CHUNK, S]
        acc_ref[...] += jax.lax.dot_general(
            oh, xt, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S_CHUNK, width]
        return 0

    jax.lax.fori_loop(0, nc, body, 0)


def _expand_a(a_ref, xg_ref, kk_col, k: int, c: int):
    """A[s, kk*C:(kk+1)*C] = Xg[s] at the entry's offset block, else 0."""
    xg = xg_ref[...]
    for kkk in range(k):
        m = (kk_col == kkk)[:, None]  # [S_CHUNK, 1] sublane mask
        a_ref[:, kkk * c:(kkk + 1) * c] = jnp.where(m, xg, 0.0).astype(
            a_ref.dtype
        )


def _ov_apply_v2_kernel(
    n_ref,  # SMEM i32[B, 1]
    srcl_ref,  # [1, n_sc_pad, 128] VMEM (lane chunks, invalid -1)
    dstl_ref,  # [1, n_sc_pad, 128]
    kkt_ref,  # [1, s_pad, 1] VMEM (sublane orientation, invalid -1)
    base_ref,  # [1, Mpad, CO]
    table_ref,  # [1, Npad, C]
    w_ref,  # [KC, CO]
    out_ref,  # [1, Mpad, CO]
    xg_s,  # scratch f32 [S_CHUNK, C]
    a_s,  # scratch bf16/f32 [S_CHUNK, KC]
    contrib_s,  # scratch f32 [s_pad, CO]
    *,
    k: int,
    c: int,
    nc_in: int,
    nc_out: int,
):
    b = pl.program_id(0)
    out_ref[0] = base_ref[0]
    live = _live_chunks(n_ref, b)

    def schunk(sc, _):
        src_row = _row_of(srcl_ref, sc)  # [1, 128]
        vmask = src_row >= 0
        kk_col = kkt_ref[0, pl.ds(pl.multiple_of(sc * S_CHUNK, S_CHUNK),
                                  S_CHUNK), 0]  # [S_CHUNK] sublane
        _gather_chunk(table_ref, src_row, vmask, nc_in, xg_s)
        _expand_a(a_s, xg_s, kk_col, k, c)
        contrib_s[pl.ds(pl.multiple_of(sc * S_CHUNK, S_CHUNK), S_CHUNK), :] = (
            jax.lax.dot_general(
                a_s[...], w_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # [S_CHUNK, CO] f32
        return 0

    jax.lax.fori_loop(0, live, schunk, 0)

    # scatter: out[n] += sum_s (n == dst[s]) * contrib[s]
    def schunk_scatter(sc, _):
        dst_row = _row_of(dstl_ref, sc)  # [1, 128]
        cj = contrib_s[
            pl.ds(pl.multiple_of(sc * S_CHUNK, S_CHUNK), S_CHUNK), :
        ].astype(out_ref.dtype)  # [S_CHUNK, CO]

        def outchunk(j, _):
            base_j = pl.multiple_of(j * N_CHUNK, N_CHUNK)
            keys = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (N_CHUNK, S_CHUNK), 0
                ) + base_j
            )
            ohd = ((keys == dst_row) & (dst_row >= 0)).astype(cj.dtype)
            cur = out_ref[0, pl.ds(base_j, N_CHUNK), :].astype(jnp.float32)
            add = jax.lax.dot_general(
                ohd, cj, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[0, pl.ds(base_j, N_CHUNK), :] = (cur + add).astype(
                out_ref.dtype
            )
            return 0

        jax.lax.fori_loop(0, nc_out, outchunk, 0)
        return 0

    jax.lax.fori_loop(0, live, schunk_scatter, 0)


def overflow_apply_batched(
    base: jax.Array,  # [B, M, CO] conv output
    table: jax.Array,  # [B, N, C] table features
    w: jax.Array,  # [K, C, CO]
    src: jax.Array,  # i32[B, S]
    dst: jax.Array,  # i32[B, S]
    kk: jax.Array,  # i32[B, S]
    valid: jax.Array,  # bool[B, S]
    n_bound: jax.Array,  # i32[B] dynamic entry count (last valid + 1)
    interpret: bool = False,
) -> jax.Array:
    """base[b, dst] += W[kk] @ table[b, src] over valid pairs (batched)."""
    b, m, co = base.shape
    k, c, _ = w.shape
    s_pad = _round_up(src.shape[1], S_CHUNK)
    npad = _round_up(table.shape[1], N_CHUNK)
    mpad = _round_up(m, N_CHUNK)
    pt = _pad_rows(table, npad, 0)
    pb = _pad_rows(base, mpad, 0)
    srcl = _lane_chunks(src, valid, s_pad)
    dstl = _lane_chunks(dst, valid, s_pad)
    kkt = _pad_rows(jnp.where(valid, kk, -1), s_pad, -1)[..., None]
    w2 = w.reshape(k * c, co).astype(table.dtype)
    nb = n_bound[:, None]
    n_sc_pad = srcl.shape[1]
    kern = functools.partial(
        _ov_apply_v2_kernel, k=k, c=c, nc_in=npad // N_CHUNK,
        nc_out=mpad // N_CHUNK,
    )
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(nb.shape, lambda bb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_sc_pad, S_CHUNK), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_sc_pad, S_CHUNK), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 1), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, co), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * c, co), lambda bb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mpad, co), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, mpad, co), base.dtype),
        scratch_shapes=[
            pltpu.VMEM((S_CHUNK, c), jnp.float32),
            pltpu.VMEM((S_CHUNK, k * c), table.dtype),
            pltpu.VMEM((s_pad, co), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_for(
                _apply_vmem_bytes(b, m, table.shape[1], c, co, k,
                                  src.shape[1], table.dtype.itemsize)
            )
        ),
        interpret=interpret,
    )(nb, srcl, dstl, kkt, pb, pt, w2)
    return out[:, :m]


def _ov_dw_v2_kernel(
    n_ref,  # SMEM i32[B, 1]
    srcl_ref,  # [1, n_sc_pad, 128]
    dstl_ref,  # [1, n_sc_pad, 128]
    kkt_ref,  # [1, s_pad, 1]
    x_ref,  # [1, Npad, C]
    gy_ref,  # [1, Mpad, CO]
    dw_ref,  # [KC, CO] f32 (accumulated across the batch grid)
    xg_s,  # scratch f32 [S_CHUNK, C]
    gg_s,  # scratch f32 [S_CHUNK, CO]
    a_s,  # scratch [S_CHUNK, KC]
    *,
    k: int,
    c: int,
    nc_in: int,
    nc_out: int,
):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _zero():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    live = _live_chunks(n_ref, b)

    def schunk(sc, _):
        src_row = _row_of(srcl_ref, sc)
        dst_row = _row_of(dstl_ref, sc)
        vmask = src_row >= 0
        kk_col = kkt_ref[0, pl.ds(pl.multiple_of(sc * S_CHUNK, S_CHUNK),
                                  S_CHUNK), 0]
        _gather_chunk(x_ref, src_row, vmask, nc_in, xg_s)
        _gather_chunk(gy_ref, dst_row, dst_row >= 0, nc_out, gg_s)
        _expand_a(a_s, xg_s, kk_col, k, c)
        dw_ref[...] += jax.lax.dot_general(
            a_s[...], gg_s[...].astype(a_s.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [KC, CO]
        return 0

    jax.lax.fori_loop(0, live, schunk, 0)


def overflow_dw_batched(
    x: jax.Array,  # [B, N, C] table features
    gy: jax.Array,  # [B, M, CO] output cotangent
    k: int,
    src: jax.Array,
    dst: jax.Array,
    kk: jax.Array,
    valid: jax.Array,
    n_bound: jax.Array,  # i32[B]
    interpret: bool = False,
) -> jax.Array:
    """dW[kk] += x[src] (x) gy[dst] over valid pairs -> f32[K, C, CO]."""
    b, _, c = x.shape
    co = gy.shape[-1]
    s_pad = _round_up(src.shape[1], S_CHUNK)
    npad = _round_up(x.shape[1], N_CHUNK)
    mpad = _round_up(gy.shape[1], N_CHUNK)
    xp = _pad_rows(x, npad, 0)
    gp = _pad_rows(gy, mpad, 0)
    srcl = _lane_chunks(src, valid, s_pad)
    dstl = _lane_chunks(dst, valid, s_pad)
    kkt = _pad_rows(jnp.where(valid, kk, -1), s_pad, -1)[..., None]
    nb = n_bound[:, None]
    n_sc_pad = srcl.shape[1]
    kern = functools.partial(
        _ov_dw_v2_kernel, k=k, c=c, nc_in=npad // N_CHUNK,
        nc_out=mpad // N_CHUNK,
    )
    dw = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(nb.shape, lambda bb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_sc_pad, S_CHUNK), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_sc_pad, S_CHUNK), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 1), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, co), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * c, co), lambda bb: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * c, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S_CHUNK, c), jnp.float32),
            pltpu.VMEM((S_CHUNK, co), jnp.float32),
            pltpu.VMEM((S_CHUNK, k * c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_for(
                _dw_vmem_bytes(b, gy.shape[1], x.shape[1], c, co, k,
                               src.shape[1], x.dtype.itemsize)
            )
        ),
        interpret=interpret,
    )(nb, srcl, dstl, kkt, xp, gp)
    return dw.reshape(k, c, co)
