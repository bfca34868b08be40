#!/usr/bin/env python
"""Surgical ablation of the fused backward kernel (window_bwd_strided,
which also serves the subm backward via pair mirroring).

Per tile the stock kernel does: compares -> gy staging -> batched gather
dot [K,CO,T] -> COPY LOOP into [KCO,T] -> dx GEMM + dW accumulation.
ct_ablate.py showed the fwd copy loop costs 1.3 ms/conv while the MXU is
idle; this probes the bwd analog:

  premult   dx = one (K*R)-contraction dot on weight-premultiplied gy
            windows (no flat ggy); dW = batched [K] dot of the raw gather
            output against a K-broadcast x tile -> [K, CO, C] accumulator
  no_copy   skip the copy loop (WRONG dx/dW; isolates its cost)

Timed in-chain (the chain feeds dx back in as gy') to amortize launches.
"""

# NOTE (round 5): this probe predates the qmeta refactor (commit a0799e0,
# "qmeta query representation") and manipulates the old [B, K, M] qkeys
# plan layout directly.  Its findings are recorded in PERF_NOTES.md and
# final; to re-run it, check out the tree at a0799e0^ or rebuild inputs
# via ops.pallas.window_conv.materialize_qkeys(plan.qmeta, plan.dkeys).

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparseeventid_tpu.io.hostio import build_window_plans
from sparseeventid_tpu.models.encoder import capacity_schedule
from sparseeventid_tpu.ops import engine as _eng
from sparseeventid_tpu.ops.pallas import window_conv as wc
from sparseeventid_tpu.ops.pallas.window_conv import (
    START_ALIGN, TILE_T, _cdiv, _conv_table, _live_tiles, _pad_lanes,
    _pad_rows, _round_up, INVALID_QUERY,
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from r_sweep_probe import make_input, B, CAP, C, GRID, DEPTH  # noqa: E402

R = int(os.environ.get("SEID_WINDOW_R", "160"))
P = int(os.environ.get("SEID_P", "4"))


def _bwd_kernel(
    live_ref, keys_ref, gyt_ref, qk_ref, start_ref, w_ref, xct_ref,
    dx_ref, dw_ref, *scratch,
    k, co, c, kco_pad, window_r, p, mode,
):
    """mode: 'stock' | 'no_copy' | 'premult'."""
    step = pl.program_id(1)
    first = (pl.program_id(0) == 0) & (step == 0)
    if mode in ("premult", "batchdx"):
        oh_s, sgy_s = scratch
    else:
        ggy_s, oh_s, sgy_s = scratch

    @pl.when(first)
    def _zero():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        if mode not in ("premult", "batchdx") and kco_pad > k * co:
            ggy_s[k * co:, :] = jnp.zeros_like(ggy_s[k * co:, :])

    for pp in range(p):
        tile = step * p + pp

        @pl.when(tile >= live_ref[pl.program_id(0), 0])
        def _dead(pp=pp):
            dx_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = jnp.zeros(
                (dx_ref.shape[1], TILE_T), dx_ref.dtype
            )

        @pl.when(tile < live_ref[pl.program_id(0), 0])
        def _live(pp=pp, tile=tile):
            qt = qk_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T]  # [K, T]
            for kk in range(k):
                start = pl.multiple_of(start_ref[0, tile, kk], START_ALIGN)
                win = keys_ref[0, pl.ds(start, window_r), 0]
                oh_s[kk] = (
                    win[:, None] == qt[kk][None, :]
                ).astype(oh_s.dtype)
                sgy_s[kk] = gyt_ref[0, pl.ds(start, window_r), :]
            x_ct = xct_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T]  # [C, T]
            if mode == "premult":
                # dx: premultiply gy windows by W^T (batched over K), one
                # (K*R)-contraction dot -> [C, T]
                ws = jax.lax.dot_general(  # [K, R, C]
                    sgy_s[:], w_ref[:],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(sgy_s.dtype)
                dx_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = (
                    jax.lax.dot_general(  # [C, T]
                        ws.reshape(k * window_r, -1),
                        oh_s[:].reshape(k * window_r, TILE_T),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(dx_ref.dtype)
                )
                # dW: raw gather output [K, CO, T] against the x tile
                # broadcast over K -> [K, CO, C]
                ggy = jax.lax.dot_general(  # [K, CO, T]
                    sgy_s[:], oh_s[:],
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(sgy_s.dtype)
                xb = jnp.broadcast_to(x_ct[None], (k, c, TILE_T))
                dw_ref[...] += jax.lax.dot_general(  # [K, CO, C]
                    ggy, xb,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                return
            if mode == "batchdx":
                # no flat ggy: dx via batched [K] dot + K-sum, dW via
                # batched dot against a K-broadcast x tile
                ggy = jax.lax.dot_general(  # [K, CO, T]
                    sgy_s[:], oh_s[:],
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(sgy_s.dtype)
                dxk = jax.lax.dot_general(  # [K, C, T]
                    w_ref[:], ggy,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                dx_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = (
                    jnp.sum(dxk, axis=0).astype(dx_ref.dtype)
                )
                xb = jnp.broadcast_to(x_ct[None], (k, c, TILE_T))
                dw_ref[...] += jax.lax.dot_general(  # [K, CO, C]
                    ggy, xb,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                return
            if mode == "bf16dot":
                # one-hot dot = pure selection (<=1 nonzero addend per
                # output element) -> bf16 accumulation is EXACT; skips the
                # f32 spill + convert pass before the copy
                ggy = jax.lax.dot_general(  # [K, CO, T]
                    sgy_s[:], oh_s[:],
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=ggy_s.dtype,
                )
            else:
                ggy = jax.lax.dot_general(  # [K, CO, T]
                    sgy_s[:], oh_s[:],
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(ggy_s.dtype)
            if mode in ("stock", "bf16dot"):
                for kk in range(k):
                    ggy_s[kk * co: (kk + 1) * co, :] = ggy[kk]
            dx_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = (
                jax.lax.dot_general(  # [C, T]
                    w_ref[:], ggy_s[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dx_ref.dtype)
            )
            dw_ref[...] += jax.lax.dot_general(  # [KCO_pad, C]
                ggy_s[:], x_ct,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def bwd_apply(keys_out, gy, feats, rq_t, rs, w, r_active, *, window_r,
              mode="stock"):
    """rq_t: [B, K, M] lane-transposed reverse/forward plan queries."""
    b, k, m = rq_t.shape
    c = feats.shape[-1]
    co = gy.shape[-1]
    p = P
    pk, pgy = _conv_table(keys_out, gy, window_r)
    npad = pk.shape[1]
    n_steps = _cdiv(m, TILE_T * p)
    n_tiles = n_steps * p
    qk_p = _pad_lanes(rq_t, n_tiles * TILE_T, INVALID_QUERY)
    x_ct = _pad_rows(feats, n_tiles * TILE_T, 0).transpose(0, 2, 1)
    if rs.shape[1] < n_tiles:
        rs = jnp.pad(rs, ((0, 0), (0, n_tiles - rs.shape[1]), (0, 0)))
    kco_pad = _round_up(k * co, 128)
    if mode in ("premult", "batchdx"):
        if mode == "premult":
            w2 = w.transpose(0, 2, 1).astype(feats.dtype)  # [K, CO, C]
            w_spec = pl.BlockSpec((k, co, c), lambda bb, i: (0, 0, 0))
        else:
            w2 = w.astype(feats.dtype)  # [K, C, CO]
            w_spec = pl.BlockSpec((k, c, co), lambda bb, i: (0, 0, 0))
        dw_spec = pl.BlockSpec((k, co, c), lambda bb, i: (0, 0, 0))
        dw_sds = jax.ShapeDtypeStruct((k, co, c), jnp.float32)
        scratch = [
            pltpu.VMEM((k, window_r, TILE_T), feats.dtype),
            pltpu.VMEM((k, window_r, co), feats.dtype),
        ]
    else:
        w2 = w.transpose(1, 0, 2).reshape(c, k * co).astype(feats.dtype)
        w2 = jnp.pad(w2, ((0, 0), (0, kco_pad - k * co)))
        w_spec = pl.BlockSpec((c, kco_pad), lambda bb, i: (0, 0))
        dw_spec = pl.BlockSpec((kco_pad, c), lambda bb, i: (0, 0))
        dw_sds = jax.ShapeDtypeStruct((kco_pad, c), jnp.float32)
        scratch = [
            pltpu.VMEM((kco_pad, TILE_T), feats.dtype),
            pltpu.VMEM((k, window_r, TILE_T), feats.dtype),
            pltpu.VMEM((k, window_r, co), feats.dtype),
        ]
    live2 = _live_tiles(r_active, m)[:, None]
    kern = functools.partial(
        _bwd_kernel, k=k, co=co, c=c, kco_pad=kco_pad, window_r=window_r,
        p=p, mode=mode,
    )
    dx, dw = pl.pallas_call(
        kern,
        grid=(b, n_steps),
        in_specs=[
            pl.BlockSpec(live2.shape, lambda bb, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, npad, 1), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, npad, co), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, k, TILE_T * p), lambda bb, i: (bb, 0, i)),
            pl.BlockSpec((1, rs.shape[1], k), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            w_spec,
            pl.BlockSpec((1, c, TILE_T * p), lambda bb, i: (bb, 0, i)),
        ],
        out_specs=(
            pl.BlockSpec((1, c, TILE_T * p), lambda bb, i: (bb, 0, i)),
            dw_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, c, n_tiles * TILE_T), feats.dtype),
            dw_sds,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        scratch_shapes=scratch,
    )(live2, pk[..., None], pgy, qk_p, rs, w2, x_ct)
    dx = dx.transpose(0, 2, 1)[:, :m]
    if mode == "premult":
        dw = dw.transpose(0, 2, 1)  # [K, C, CO]
    else:
        dw = dw[: k * co].reshape(k, co, c).transpose(0, 2, 1)
    return dx, dw


def timeit(fn, *args, iters=12):
    o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    st, coords = make_input()
    caps = capacity_schedule(CAP, DEPTH, 0.5, 1024)
    offs = np.asarray(
        [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
        np.int32,
    )
    qkeys_t = wc.compute_query_keys(st, offs).transpose(0, 2, 1)
    keys = st.keys()
    r = np.random.default_rng(1)
    w = jnp.asarray(r.integers(-2, 3, (27, C, C)).astype(np.float32),
                    jnp.bfloat16)
    gy = jnp.asarray(r.integers(-3, 4, (B, CAP, C)).astype(np.float32),
                     jnp.bfloat16) * st.row_mask()[..., None].astype(jnp.bfloat16)
    x = jnp.asarray(r.integers(-3, 4, (B, CAP, C)).astype(np.float32),
                    jnp.bfloat16) * st.row_mask()[..., None].astype(jnp.bfloat16)
    host = build_window_plans(
        coords, GRID, list(caps),
        initial_kernel=(5, 5, 5), series_kernel=(3, 3, 3),
        stride=(2, 2, 2), window_r=R,
        ov_caps=[_eng._overflow_cap(cc, 27) for cc in caps],
        ov_cap_initial=_eng._overflow_cap(caps[0], 125),
        ov_caps_down=[_eng._overflow_cap(cc, 8) for cc in caps[:-1]],
    )
    start = jnp.asarray(host["lvl0/series/start"])

    # equality: premult must match stock bit-exactly on integer data
    fs = jax.jit(functools.partial(bwd_apply, window_r=R, mode="stock"))
    fp = jax.jit(functools.partial(bwd_apply, window_r=R, mode="premult"))
    dxs, dws = fs(keys, gy, x, qkeys_t, start, w, st.n_active)
    dxp, dwp = fp(keys, gy, x, qkeys_t, start, w, st.n_active)
    fb2 = jax.jit(functools.partial(bwd_apply, window_r=R, mode="batchdx"))
    dxb2, dwb2 = fb2(keys, gy, x, qkeys_t, start, w, st.n_active)
    print("batchdx dx err:", float(jnp.max(jnp.abs(dxs.astype(jnp.float32)
                                                   - dxb2.astype(jnp.float32)))))
    print("batchdx dw err:", float(jnp.max(jnp.abs(dws - dwb2))))
    print("dx err:", float(jnp.max(jnp.abs(dxs.astype(jnp.float32)
                                           - dxp.astype(jnp.float32)))))
    print("dw err:", float(jnp.max(jnp.abs(dws - dwp))))
    # and stock matches production window_bwd_strided
    dxr, dwr = jax.jit(functools.partial(
        wc.window_bwd_strided, window_r=R))(
        keys, gy, x, qkeys_t, start, w, st.n_active)
    print("stock vs production dx err:",
          float(jnp.max(jnp.abs(dxs.astype(jnp.float32)
                                - dxr.astype(jnp.float32)))))

    def chain(n, mode):
        def f(g0, qk, s0):
            g = g0
            for _ in range(n):
                dx, _ = bwd_apply(keys, g, x, qk, s0, w, st.n_active,
                                  window_r=R, mode=mode)
                g = dx.astype(jnp.bfloat16)
            return g
        return jax.jit(f)

    warm = chain(8, "stock")
    for _ in range(4):
        _ = float(jnp.sum(warm(gy, qkeys_t, start).astype(jnp.float32)))
    for mode in ["stock", "batchdx", "no_copy", "premult"]:
        t1 = timeit(chain(1, mode), gy, qkeys_t, start)
        t8 = timeit(chain(8, mode), gy, qkeys_t, start)
        print(f"{mode:8s} per-bwd {(t8 - t1) / 7:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
