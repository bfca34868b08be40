#!/usr/bin/env python
"""Surgical ablation of the PRODUCTION CT conv kernel (G=1, ct=True).

ablate_chain.py measures the legacy orientation; this measures the shares
inside the CT P=4 kernel the train step actually runs, plus two candidate
variants:

  qk_t     qkeys pre-transposed to [B, K, M] so the kernel skips the
           per-tile [T, K] -> [K, T] lane<->sublane transpose
  no_copy  skip the [K, C, T] -> [KC, T] scratch copy loop (wrong numerics)

Variants with do_* flags off produce WRONG numerics on purpose.
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
    START_ALIGN, TILE_T, _bounded_queries, _cdiv, _conv_table, _live_tiles,
    _round_up,
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from r_sweep_probe import make_input, B, CAP, C, GRID, DEPTH  # noqa: E402

R = int(os.environ.get("SEID_WINDOW_R", "160"))
P = int(os.environ.get("SEID_P", "4"))


def _ct_kernel(
    live_ref, keys_ref, table_ref, qk_ref, start_ref, w_ref, out_ref,
    g_scratch, oh_scratch, s_scratch, wk_scratch,
    *, k, c, kc_pad, window_r, p, qk_t, do_compare, do_stage, do_dot,
    do_copy, do_gemm, rs_copy=False, wfuse=False, kc_contract=False,
    f32oh=False, cmp1=False,
):
    step = pl.program_id(1)
    if kc_pad > k * c and not wfuse:
        @pl.when((pl.program_id(0) == 0) & (step == 0))
        def _zero_pad():
            g_scratch[k * c:, :] = jnp.zeros_like(g_scratch[k * c:, :])

    for pp in range(p):
        tile = step * p + pp

        @pl.when(tile >= live_ref[pl.program_id(0), 0])
        def _dead(pp=pp):
            out_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = jnp.zeros(
                (out_ref.shape[1], TILE_T), out_ref.dtype
            )

        @pl.when(tile < live_ref[pl.program_id(0), 0])
        def _live(pp=pp, tile=tile):
            if qk_t:
                qt = qk_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T]  # [K, T]
            else:
                qt = qk_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :].transpose(1, 0)
            if cmp1:
                # stage window keys per offset, then ONE batched compare
                for kk in range(k):
                    start = pl.multiple_of(
                        start_ref[0, tile, kk], START_ALIGN
                    )
                    wk_scratch[kk] = keys_ref[0, pl.ds(start, window_r), :]
                    s_scratch[kk] = table_ref[
                        0, pl.ds(start, window_r), :
                    ].astype(s_scratch.dtype)
                oh_scratch[...] = (
                    wk_scratch[:] == qt[:, None, :]
                ).astype(oh_scratch.dtype)
            else:
                for kk in range(k):
                    start = pl.multiple_of(
                        start_ref[0, tile, kk], START_ALIGN
                    )
                    if do_compare:
                        win = keys_ref[0, pl.ds(start, window_r), 0]
                        oh_scratch[kk] = (
                            win[:, None] == qt[kk][None, :]
                        ).astype(oh_scratch.dtype)
                    if do_stage:
                        s_scratch[kk] = table_ref[
                            0, pl.ds(start, window_r), :
                        ].astype(s_scratch.dtype)
            if wfuse:
                # premultiply staged windows by the weights (batched over K),
                # then ONE (K*R)-contraction dot -> [CO, T]; no copy, no GEMM
                ws = jax.lax.dot_general(  # [K, R, CO]
                    s_scratch[:], w_ref[:],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(s_scratch.dtype)
                out_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = (
                    jax.lax.dot_general(  # [CO, T]
                        ws.reshape(k * window_r, -1),
                        oh_scratch[:].reshape(k * window_r, TILE_T),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(out_ref.dtype)
                )
                return
            if kc_contract:
                gkt = jax.lax.dot_general(  # [K, C, T]
                    s_scratch[:], oh_scratch[:],
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(s_scratch.dtype)
                out_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = (
                    jax.lax.dot_general(  # [CO, T], contraction (K, C)
                        w_ref[:], gkt,
                        dimension_numbers=(((0, 1), (0, 1)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(out_ref.dtype)
                )
                return
            if do_dot:
                gkt = jax.lax.dot_general(
                    s_scratch[:], oh_scratch[:],
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(g_scratch.dtype)
                if do_copy:
                    if rs_copy:
                        g_scratch[pl.ds(0, k * c), :] = gkt.reshape(
                            k * c, TILE_T
                        )
                    else:
                        for kk in range(k):
                            g_scratch[kk * c: (kk + 1) * c, :] = gkt[kk]
            if do_gemm:
                out_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = (
                    jax.lax.dot_general(
                        w_ref[:], g_scratch[:],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(out_ref.dtype)
                )
            else:
                out_ref[0, :, pp * TILE_T:(pp + 1) * TILE_T] = jnp.zeros(
                    (out_ref.shape[1], TILE_T), out_ref.dtype
                )


def variant_apply(keys, feats, qkeys, start, w, q_active, *, window_r,
                  qk_t=False, do_compare=True, do_stage=True, do_dot=True,
                  do_copy=True, do_gemm=True, rs_copy=False, wfuse=False,
                  kc_contract=False, f32oh=False, cmp1=False):
    b, m, k = qkeys.shape
    c = feats.shape[-1]
    co = w.shape[-1]
    p = P
    mb = m  # no q_bound in this probe
    pk, pt = _conv_table(keys, feats, window_r)
    npad = pk.shape[1]
    n_steps = _cdiv(mb, TILE_T * p)
    n_tiles = n_steps * p
    kc_pad = _round_up(k * c, 8)
    if wfuse or kc_contract:
        w2 = w.astype(jnp.float32 if f32oh else feats.dtype)  # [K, C, CO]
        wspec = pl.BlockSpec((k, c, co), lambda bb, s: (0, 0, 0))
    else:
        w2 = jnp.pad(
            w.reshape(k * c, co).transpose(1, 0),
            ((0, 0), (0, kc_pad - k * c)),
        ).astype(feats.dtype)  # [CO, KC_pad]
        wspec = pl.BlockSpec((co, kc_pad), lambda bb, s: (0, 0))
    qk_in = qkeys.transpose(0, 2, 1) if qk_t else qkeys
    qspec = (
        pl.BlockSpec((1, k, p * TILE_T), lambda bb, s: (bb, 0, s))
        if qk_t else
        pl.BlockSpec((1, p * TILE_T, k), lambda bb, s: (bb, s, 0))
    )
    live2 = _live_tiles(q_active, mb)[:, None]
    kern = functools.partial(
        _ct_kernel, k=k, c=c, kc_pad=kc_pad, window_r=window_r, p=p,
        qk_t=qk_t, do_compare=do_compare, do_stage=do_stage, do_dot=do_dot,
        do_copy=do_copy, do_gemm=do_gemm, rs_copy=rs_copy, wfuse=wfuse,
        kc_contract=kc_contract, f32oh=f32oh, cmp1=cmp1,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, n_steps),
        in_specs=[
            pl.BlockSpec(live2.shape, lambda bb, s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, npad, 1), lambda bb, s: (bb, 0, 0)),
            pl.BlockSpec((1, npad, c), lambda bb, s: (bb, 0, 0)),
            qspec,
            pl.BlockSpec((1, n_tiles, k), lambda bb, s: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            wspec,
        ],
        out_specs=pl.BlockSpec((1, co, p * TILE_T), lambda bb, s: (bb, 0, s)),
        out_shape=jax.ShapeDtypeStruct((b, co, n_tiles * TILE_T), feats.dtype),
        scratch_shapes=[
            pltpu.VMEM((kc_pad, TILE_T), feats.dtype),
            pltpu.VMEM((k, window_r, TILE_T),
                       jnp.float32 if f32oh else feats.dtype),
            pltpu.VMEM((k, window_r, c),
                       jnp.float32 if f32oh else feats.dtype),
            pltpu.VMEM((k, window_r, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(live2, pk[..., None], pt, qk_in, start, w2)
    return out.transpose(0, 2, 1)[:, :m]


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
    qkeys = wc.compute_query_keys(st, offs)
    keys = st.keys()
    w = jnp.asarray(
        np.random.default_rng(1).standard_normal((27, C, C)) * 0.1,
        jnp.bfloat16,
    )
    host = build_window_plans(
        coords, GRID, list(caps),
        initial_kernel=(5, 5, 5), series_kernel=(3, 3, 3),
        stride=(2, 2, 2), window_r=R,
        ov_caps=[_eng._overflow_cap(cc, 27) for cc in caps],
        ov_cap_initial=_eng._overflow_cap(caps[0], 125),
        ov_caps_down=[_eng._overflow_cap(cc, 8) for cc in caps[:-1]],
    )
    start = jnp.asarray(host["lvl0/series/start"])

    variants = [
        ("stock", {}),
        ("rs_copy", dict(rs_copy=True)),
        ("wfuse", dict(wfuse=True)),
        ("wfuse+qk_t", dict(wfuse=True, qk_t=True)),
        ("wf+qk_t+f32", dict(wfuse=True, qk_t=True, f32oh=True)),
        ("wf+qk_t+cmp1", dict(wfuse=True, qk_t=True, cmp1=True)),
        ("qk_t", dict(qk_t=True)),
        ("no_copy", dict(do_copy=False)),
        ("no_gemm", dict(do_gemm=False)),
        ("no_dot", dict(do_dot=False, do_copy=False)),
        ("no_compare", dict(do_compare=False)),
        ("no_stage", dict(do_stage=False)),
        ("skeleton", dict(do_compare=False, do_stage=False, do_dot=False,
                          do_copy=False, do_gemm=False)),
    ]

    # equality: qk_t must match stock exactly
    a = jax.jit(functools.partial(variant_apply, window_r=R))(
        keys, st.feats, qkeys, start, w, st.n_active
    )
    bq = jax.jit(functools.partial(variant_apply, window_r=R, qk_t=True))(
        keys, st.feats, qkeys, start, w, st.n_active
    )
    stock_ref = jax.jit(functools.partial(wc.window_conv_apply, window_r=R))(
        keys, st.feats, qkeys.transpose(0, 2, 1), start, w, st.n_active
    )
    print("qk_t vs stock-variant err:",
          float(jnp.max(jnp.abs(a.astype(jnp.float32) - bq.astype(jnp.float32)))))
    print("variant vs production err:",
          float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - stock_ref.astype(jnp.float32)))))

    def chain(n, flags):
        def f(x, qk, s0):
            y = x
            for _ in range(n):
                y = variant_apply(
                    keys, y, qk, s0, w, st.n_active, window_r=R, **flags
                ).astype(jnp.bfloat16)
            return y
        return jax.jit(f)

    warm = chain(8, {})
    for _ in range(4):
        _ = float(jnp.sum(warm(st.feats, qkeys, start).astype(jnp.float32)))

    base = None
    for name, flags in variants:
        t1 = timeit(chain(1, flags), st.feats, qkeys, start)
        t8 = timeit(chain(8, flags), st.feats, qkeys, start)
        slope = (t8 - t1) / 7
        if base is None:
            base = slope
        print(f"{name:12s} per-conv {slope:6.3f} ms   "
              f"delta vs stock {slope - base:+6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
