#!/usr/bin/env python
"""Round-4 formulation probe: is the window kernel bound by the [K,R,T]
one-hot SCRATCH round-trip rather than by compares or MXU MACs?

Evidence so far (r3): grouped-K dots with 4x the MACs time the same as
batched-K (=> not MAC-bound); compares are ~24%; "skeleton" ~34%.  The
remaining suspect is VMEM traffic: the current kernel materializes
oh[K,R,T] (1 MB/tile) + s[K,R,C] through scratch, ~2.5 MB/tile round-trip.

Variants timed IN-CHAIN (N=1 vs N=8 slope, the r2/r3 calibrated method):

  A. current window_conv_apply (wfuse path) — baseline
  B. "valueized": whole-table premultiply ws[k] = table @ W[k] into a
     persistent VMEM scratch ONCE per batch element (step==0), then per
     tile a python loop over K: oh_k and the ws window are VALUES feeding
     one accumulating [CO,T] dot each — no oh/s scratch round-trip.
  C. premul-only: whole-table premul + the batched [K,R,T] oh scratch as
     today (isolates the premul-dot saving from the scratch saving).

All variants compute the same in-window contribution (sidecar excluded)
and are checked for numeric agreement (<=1e-2 rel, bf16) before timing.
"""

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
from sparseeventid_tpu.ops import engine
from sparseeventid_tpu.ops.pallas.window_engine import (
    build_submanifold_window_plan,
)

B = 8
CAP = 25600
C = 32
CO = 32
K = 27
GRID = (1024, 512, 1280)
T = wc.TILE_T
R = 144
ACTIVE = 25000


def timeit(fn, *args, iters=10):
    o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


# ---------------------------------------------------------------- variants
def _valueized_kernel(
    live_ref, keys_ref, table_ref, qk_ref, start_ref, w_ref, out_ref,
    ws_scratch, *, k, c, co, window_r, premul_rows,
):
    bb = pl.program_id(0)
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _premul():
        # whole-table premultiply, looped in row blocks (bounded VMEM
        # values).  ws layout [npad, K*CO]: a [K, npad, CO] scratch would
        # lane-pad CO=32 to 128 (4x VMEM).
        nb = premul_rows
        npad = ws_scratch.shape[0]
        for r0 in range(0, npad, nb):
            rows = min(nb, npad - r0)
            blk = table_ref[0, r0:r0 + rows, :]
            for kk in range(k):
                ws_scratch[r0:r0 + rows, kk * co:(kk + 1) * co] = (
                    jax.lax.dot_general(
                        blk, w_ref[kk],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(ws_scratch.dtype)
                )

    tile = step

    @pl.when(tile >= live_ref[bb, 0])
    def _dead():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

    @pl.when(tile < live_ref[bb, 0])
    def _live():
        qt = qk_ref[0]  # [K, T]
        acc = jnp.zeros((co, T), jnp.float32)
        for kk in range(k):
            start = pl.multiple_of(start_ref[0, tile, kk], wc.START_ALIGN)
            win = keys_ref[0, pl.ds(start, window_r), 0]  # [R] value
            oh = (win[:, None] == qt[kk][None, :]).astype(jnp.bfloat16)
            ws = ws_scratch[pl.ds(start, window_r), kk * co:(kk + 1) * co]
            acc = acc + jax.lax.dot_general(
                ws, oh,  # contract R -> [CO, T]
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[0] = acc.astype(out_ref.dtype)


def _premul_batched_kernel(
    live_ref, keys_ref, table_ref, qk_ref, start_ref, w_ref, out_ref,
    ws_scratch, oh_scratch, sw_scratch, *, k, c, co, window_r, premul_rows,
):
    bb = pl.program_id(0)
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _premul():
        nb = premul_rows
        npad = ws_scratch.shape[0]
        for r0 in range(0, npad, nb):
            rows = min(nb, npad - r0)
            blk = table_ref[0, r0:r0 + rows, :]
            for kk in range(k):
                ws_scratch[r0:r0 + rows, kk * co:(kk + 1) * co] = (
                    jax.lax.dot_general(
                        blk, w_ref[kk],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(ws_scratch.dtype)
                )

    tile = step

    @pl.when(tile >= live_ref[bb, 0])
    def _dead():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

    @pl.when(tile < live_ref[bb, 0])
    def _live():
        qt = qk_ref[0]
        for kk in range(k):
            start = pl.multiple_of(start_ref[0, tile, kk], wc.START_ALIGN)
            win = keys_ref[0, pl.ds(start, window_r), 0]
            oh_scratch[kk] = (win[:, None] == qt[kk][None, :]).astype(
                oh_scratch.dtype
            )
            sw_scratch[kk] = ws_scratch[pl.ds(start, window_r), kk * co:(kk + 1) * co]
        out_ref[0] = jax.lax.dot_general(  # [CO, T]
            sw_scratch[:].reshape(k * window_r, co),
            oh_scratch[:].reshape(k * window_r, T),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def make_variant(kernel, keys, plan, w, extra_scratch, premul_rows=2048):
    npad16 = wc._round_up(CAP, 16)
    pk = keys[..., None]
    n_tiles = CAP // T
    live2 = wc._live_tiles(plan.q_active, CAP)[:, None]

    def f(feats):
        kern = functools.partial(
            kernel, k=K, c=C, co=CO, window_r=R, premul_rows=premul_rows,
        )
        out = pl.pallas_call(
            kern,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec(live2.shape, lambda bb, i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, npad16, 1), lambda bb, i: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npad16, C), lambda bb, i: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, T), lambda bb, i: (bb, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_tiles, K), lambda bb, i: (bb, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((K, C, CO), lambda bb, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, CO, T), lambda bb, i: (bb, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, CO, n_tiles * T), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((npad16, K * CO), jnp.bfloat16)]
            + extra_scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
        )(live2, pk, feats, plan.qkeys, plan.start, w)
        return out.transpose(0, 2, 1)  # [B, M, CO]

    return f


def main():
    r = np.random.default_rng(0)
    coords = np.full((B, CAP, 3), -1, np.int32)
    for b in range(B):
        per = ACTIVE // 40
        pts = []
        for t in range(40):
            start = r.uniform(0.2, 0.8, 3) * np.array(GRID)
            d = r.normal(size=3)
            d /= np.linalg.norm(d)
            steps = np.arange(per)[:, None] * d[None, :] * 2.0
            pts.append(start[None, :] + steps
                       + r.normal(scale=0.6, size=(per, 3)))
        pts = np.concatenate(pts)
        np.clip(pts, 0, np.array(GRID) - 1, out=pts)
        cc = np.unique(pts.astype(np.int32), axis=0)
        coords[b, : min(len(cc), CAP)] = cc[:CAP]
    # integer-valued feats: bf16 MXU passes are bit-exact -> strict check
    feats = jnp.asarray(
        r.integers(-3, 4, (B, CAP, C)).astype(np.float32), jnp.bfloat16
    )
    st = ops.build_sparse_tensor(
        jnp.asarray(coords), feats.astype(jnp.float32), GRID
    )
    st = st.with_feats(st.feats.astype(jnp.bfloat16))
    print("building plan on device...", flush=True)
    plan = jax.jit(
        lambda s: build_submanifold_window_plan(
            s, (3, 3, 3), overflow_cap=engine._overflow_cap(s.capacity),
            window_r=R,
        )
    )(st)
    _ = float(jnp.sum(plan.start))
    keys = st.keys()
    w = jnp.asarray(r.integers(-2, 3, (K, C, CO)).astype(np.float32),
                    jnp.bfloat16)

    def chain(f, n):
        def g(x):
            for _ in range(n):
                x = f(x).astype(jnp.bfloat16)
            return x
        return jax.jit(g)

    base = lambda x: wc.window_conv_apply(
        keys, x, plan.qkeys, plan.start, w, plan.q_active,
        window_r=R, q_bound=None,
    )
    val = make_variant(_valueized_kernel, keys, plan, w, [])
    npad16 = wc._round_up(CAP, 16)
    prem = make_variant(
        _premul_batched_kernel, keys, plan, w,
        [pltpu.VMEM((K, R, T), jnp.bfloat16),
         pltpu.VMEM((K, R, CO), jnp.bfloat16)],
    )

    # numeric agreement first (integer data -> exact)
    o_a = np.asarray(base(st.feats).astype(jnp.float32))
    for name, f in [("valueized", val), ("premul-batched", prem)]:
        o = np.asarray(f(st.feats).astype(jnp.float32))
        err = np.max(np.abs(o - o_a))
        print(f"{name}: max |diff| vs base = {err:.2e}", flush=True)

    for name, f in [("base-wfuse", base), ("valueized", val),
                    ("premul-batched", prem)]:
        t1 = timeit(chain(f, 1), st.feats)
        t8 = timeit(chain(f, 8), st.feats)
        slope = (t8 - t1) / 7
        print(f"{name:16s} N=1 {t1:7.2f} ms  N=8 {t8:7.2f} ms  "
              f"slope {slope:6.3f} ms/conv", flush=True)


if __name__ == "__main__":
    main()
