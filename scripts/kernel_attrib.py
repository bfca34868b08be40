#!/usr/bin/env python
"""Attribute the window-conv kernel time at dune3d level-0 shapes.

Times stock window_conv_apply plus surgically modified kernel variants
(ablating the compare, the table staging, the batched dot, the final GEMM;
varying K and WINDOW_R) to locate the gap between the per-tile op-count
estimate (~2-3 us/tile) and the measured ~13.7 ms fwd kernel.
Variants produce WRONG numerics on purpose — timing only.
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

from sparseeventid_tpu import ops
from sparseeventid_tpu.ops.pallas import window_conv as wc
from sparseeventid_tpu.ops.pallas.window_conv import (
    INVALID_QUERY, START_ALIGN, TILE_T, _cdiv, _live_tiles, _pad_rows,
    _padded_table, _round_up, compute_query_keys,
)
from sparseeventid_tpu.ops.pallas.window_engine import (
    build_submanifold_window_plan,
)
from sparseeventid_tpu.ops import engine

B, CAP, C = 8, 50000, 32
GRID = (1024, 512, 1280)


def make_input():
    r = np.random.default_rng(0)
    coords = np.full((B, CAP, 3), -1, np.int32)
    for b in range(B):
        per = 20000 // 40
        pts = []
        for t in range(40):
            start = r.uniform(0.2, 0.8, 3) * np.array(GRID)
            d = r.normal(size=3)
            d /= np.linalg.norm(d)
            steps = np.arange(per)[:, None] * d[None, :] * 2.0
            pts.append(start[None, :] + steps + r.normal(scale=0.6, size=(per, 3)))
        pts = np.concatenate(pts)
        np.clip(pts, 0, np.array(GRID) - 1, out=pts)
        cc = np.unique(pts.astype(np.int32), axis=0)
        coords[b, : min(len(cc), CAP)] = cc[:CAP]
    st = ops.build_sparse_tensor(
        jnp.asarray(coords),
        jnp.asarray(r.standard_normal((B, CAP, C)).astype(np.float32)),
        GRID,
    )
    return st.with_feats(st.feats.astype(jnp.bfloat16)), r


def _variant_kernel(
    live_ref, keys_ref, table_ref, qk_ref, start_ref, w_ref, out_ref,
    g_scratch, oh_scratch, s_scratch, *,
    k, c, kc_pad, window_r,
    do_compare=True, do_stage=True, do_dot=True, do_gemm=True,
    static_start=False,
):
    tile = pl.program_id(1)

    @pl.when(tile >= live_ref[pl.program_id(0), 0])
    def _dead():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

    @pl.when(tile < live_ref[pl.program_id(0), 0])
    def _live():
        if kc_pad > k * c:
            g_scratch[:, k * c:] = jnp.zeros_like(g_scratch[:, k * c:])
        qt = qk_ref[0].transpose(1, 0)
        for kk in range(k):
            if static_start:
                start = kk * START_ALIGN
            else:
                start = pl.multiple_of(start_ref[0, tile, kk], START_ALIGN)
            if do_compare:
                win = keys_ref[0, pl.ds(start, window_r), 0]
                oh_scratch[kk] = (
                    win[:, None] == qt[kk][None, :]
                ).astype(oh_scratch.dtype)
            if do_stage:
                s_scratch[kk] = table_ref[0, pl.ds(start, window_r), :]
        if do_dot:
            gkt = jax.lax.dot_general(
                oh_scratch[:], s_scratch[:],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(g_scratch.dtype)
            for kk in range(k):
                g_scratch[:, kk * c: (kk + 1) * c] = gkt[kk]
        if do_gemm:
            out_ref[0] = jax.lax.dot_general(
                g_scratch[:], w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)
        else:
            out_ref[0] = g_scratch[:, : out_ref.shape[2]]


def variant_apply(keys, feats, qkeys, start, w, q_active, window_r, **flags):
    b, m, k = qkeys.shape
    c = feats.shape[-1]
    co = w.shape[-1]
    pk, pt = _padded_table(keys, feats)
    npad = pk.shape[1]
    n_tiles = _cdiv(m, TILE_T)
    qk_p = _pad_rows(qkeys, n_tiles * TILE_T, INVALID_QUERY)
    kc_pad = _round_up(k * c, 128)
    w2 = w.reshape(k * c, co).astype(feats.dtype)
    w2 = jnp.pad(w2, ((0, kc_pad - k * c), (0, 0)))
    live2 = _live_tiles(q_active, m)[:, None]
    kern = functools.partial(
        _variant_kernel, k=k, c=c, kc_pad=kc_pad, window_r=window_r, **flags
    )
    out = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(live2.shape, lambda bb, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, npad, 1), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T, k), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, start.shape[1], k), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((kc_pad, co), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, co), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * TILE_T, co), feats.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE_T, kc_pad), feats.dtype),
            pltpu.VMEM((k, window_r, TILE_T), feats.dtype),
            pltpu.VMEM((k, window_r, c), feats.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(live2, pk[..., None], pt, qk_p, start, w2)
    return out[:, :m]


def _multi_kernel(
    live_ref, keys_ref, table_ref, qk_ref, start_ref, w_ref, out_ref,
    g_scratch, oh_scratch, s_scratch, *,
    k, c, kc_pad, window_r, p,
    do_compare=True, do_stage=True, do_dot=True, do_gemm=True,
):
    """P query tiles per grid step — amortize the per-step fixed cost."""
    step = pl.program_id(1)
    for pp in range(p):
        tile = step * p + pp

        @pl.when(tile >= live_ref[pl.program_id(0), 0])
        def _dead(pp=pp):
            out_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :] = jnp.zeros(
                (TILE_T, out_ref.shape[2]), out_ref.dtype)

        @pl.when(tile < live_ref[pl.program_id(0), 0])
        def _live(pp=pp, tile=tile):
            if kc_pad > k * c:
                g_scratch[:, k * c:] = jnp.zeros_like(g_scratch[:, k * c:])
            qt = qk_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :].transpose(1, 0)
            for kk in range(k):
                start = pl.multiple_of(start_ref[0, tile, kk], START_ALIGN)
                if do_compare:
                    win = keys_ref[0, pl.ds(start, window_r), 0]
                    oh_scratch[kk] = (
                        win[:, None] == qt[kk][None, :]
                    ).astype(oh_scratch.dtype)
                if do_stage:
                    s_scratch[kk] = table_ref[0, pl.ds(start, window_r), :]
            if do_dot:
                gkt = jax.lax.dot_general(
                    oh_scratch[:], s_scratch[:],
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(g_scratch.dtype)
                for kk in range(k):
                    g_scratch[:, kk * c: (kk + 1) * c] = gkt[kk]
            if do_gemm:
                out_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :] = (
                    jax.lax.dot_general(
                        g_scratch[:], w_ref[:],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(out_ref.dtype))
            else:
                out_ref[0, pp * TILE_T:(pp + 1) * TILE_T, :] = (
                    g_scratch[:, : out_ref.shape[2]])


def multi_apply(keys, feats, qkeys, start, w, q_active, window_r, p,
                **flags):
    b, m, k = qkeys.shape
    c = feats.shape[-1]
    co = w.shape[-1]
    pk, pt = _padded_table(keys, feats)
    npad = pk.shape[1]
    n_steps = _cdiv(m, TILE_T * p)
    n_tiles = n_steps * p
    qk_p = _pad_rows(qkeys, n_tiles * TILE_T, INVALID_QUERY)
    if start.shape[1] < n_tiles:
        start = jnp.pad(start, ((0, 0), (0, n_tiles - start.shape[1]),
                                (0, 0)))
    kc_pad = _round_up(k * c, 128)
    w2 = w.reshape(k * c, co).astype(feats.dtype)
    w2 = jnp.pad(w2, ((0, kc_pad - k * c), (0, 0)))
    live2 = _live_tiles(q_active, m)[:, None]
    kern = functools.partial(
        _multi_kernel, k=k, c=c, kc_pad=kc_pad, window_r=window_r, p=p,
        **flags
    )
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
            pl.BlockSpec((1, TILE_T * p, k), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, start.shape[1], k), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((kc_pad, co), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T * p, co),
                               lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * TILE_T, co),
                                       feats.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE_T, kc_pad), feats.dtype),
            pltpu.VMEM((k, window_r, TILE_T), feats.dtype),
            pltpu.VMEM((k, window_r, c), feats.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(live2, pk[..., None], pt, qk_p, start, w2)
    return out[:, :m]


def timeit(fn, *args, iters=10):
    o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    st, r = make_input()
    print(f"n_active: {np.asarray(st.n_active)}", flush=True)
    t0 = time.time()
    plan = jax.jit(
        lambda s: build_submanifold_window_plan(
            s, (3, 3, 3), overflow_cap=engine._overflow_cap(s.capacity)
        )
    )(st)
    plan = jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, 'block_until_ready') else x, plan)
    print(f"plan built {time.time()-t0:.0f}s", flush=True)
    live = np.asarray(_live_tiles(plan.q_active, st.capacity))
    print(f"live tiles/elem: {live} (of {_cdiv(CAP, TILE_T)}) "
          f"total {live.sum()}", flush=True)

    keys = st.keys()
    w27 = jnp.asarray(r.standard_normal((27, C, C)) * 0.05, jnp.bfloat16)

    stock = jax.jit(functools.partial(wc.window_conv_apply, window_r=176))
    t = timeit(stock, keys, st.feats, plan.qkeys, plan.start, w27,
               plan.q_active)
    print(f"stock fwd (R=176, K=27):        {t:7.2f} ms", flush=True)

    def run(name, window_r=176, kslice=27, **flags):
        fn = jax.jit(functools.partial(
            variant_apply, window_r=window_r, **flags))
        qk = plan.qkeys[:, :, :kslice]
        stt = plan.start[:, :, :kslice]
        wk = w27[:kslice]
        t = timeit(fn, keys, st.feats, qk, stt, wk, plan.q_active)
        print(f"{name:32s}{t:7.2f} ms", flush=True)
        return t

    if os.environ.get("ATTRIB_ABLATE"):
        run("variant full (sanity)")
        run("no final GEMM", do_gemm=False)
        run("no dot (compare+stage only)", do_dot=False, do_gemm=False)
        run("compare only (no stage)", do_stage=False, do_dot=False,
            do_gemm=False)
        run("stage only (no compare)", do_compare=False, do_dot=False,
            do_gemm=False)
        run("empty body", do_compare=False, do_stage=False, do_dot=False,
            do_gemm=False)
        run("static starts (full)", static_start=True)
        run("K=9 full", kslice=9)
        run("K=1 full", kslice=1)
        run("R=96 full", window_r=96)
        run("R=352 full", window_r=352)

    # -------- multi-tile steps + static query bound --------
    BOUND = 24576  # 192 tiles; max n_active here is ~17.6k

    def run_multi(name, p, bound=None, **flags):
        fn = jax.jit(functools.partial(multi_apply, window_r=176, p=p,
                                       **flags))
        qk, stt = plan.qkeys, plan.start
        if bound is not None:
            qk = qk[:, :bound]
            stt = stt[:, : bound // TILE_T]
        t = timeit(fn, keys, st.feats, qk, stt, w27, plan.q_active)
        print(f"{name:32s}{t:7.2f} ms", flush=True)
        return t

    def run_stock_bound(name, bound):
        fn = jax.jit(functools.partial(wc.window_conv_apply, window_r=176))
        t = timeit(fn, keys, st.feats, plan.qkeys[:, :bound],
                   plan.start[:, : bound // TILE_T], w27, plan.q_active)
        print(f"{name:32s}{t:7.2f} ms", flush=True)

    run_stock_bound("stock, bound 24576", BOUND)
    run_multi("P=2 full-cap", p=2)
    run_multi("P=4 full-cap", p=4)
    run_multi("P=2 bound 24576", p=2, bound=BOUND)
    run_multi("P=4 bound 24576", p=4, bound=BOUND)
    run_multi("P=8 bound 24576", p=8, bound=BOUND)
    run_multi("P=4 bound, empty body", p=4, bound=BOUND, do_compare=False,
              do_stage=False, do_dot=False, do_gemm=False)
    run_multi("P=4 bound, no dot", p=4, bound=BOUND, do_dot=False,
              do_gemm=False)

    # numeric sanity of the multi-tile kernel vs stock
    a = stock(keys, st.feats, plan.qkeys, plan.start, w27, plan.q_active)
    bm = jax.jit(functools.partial(multi_apply, window_r=176, p=4))(
        keys, st.feats, plan.qkeys, plan.start, w27, plan.q_active)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - bm.astype(jnp.float32))))
    print(f"multi-vs-stock max |diff|: {diff}", flush=True)

    # production kernel with q_bound: timing + equality vs unbounded
    sb = jax.jit(functools.partial(wc.window_conv_apply, window_r=176,
                                   q_bound=24576))
    t = timeit(sb, keys, st.feats, plan.qkeys, plan.start, w27,
               plan.q_active)
    print(f"stock q_bound=24576:            {t:7.2f} ms", flush=True)
    ab = sb(keys, st.feats, plan.qkeys, plan.start, w27, plan.q_active)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - ab.astype(jnp.float32))))
    print(f"bound-vs-unbounded max |diff|: {diff}", flush=True)

    # dW kernel timing (bound + not)
    gy = jnp.asarray(
        np.random.default_rng(3).standard_normal(
            (B, plan.qkeys.shape[1], C)), jnp.bfloat16)
    for qb in (None, 24576):
        fdw = jax.jit(functools.partial(wc.window_dw, window_r=176,
                                        q_bound=qb))
        t = timeit(fdw, keys, st.feats, plan.qkeys, plan.start, gy,
                   plan.q_active)
        print(f"window_dw q_bound={str(qb):6s}:      {t:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
