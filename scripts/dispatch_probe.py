#!/usr/bin/env python
"""Isolate the per-call constant seen in kernel_attrib: dispatch floor,
pallas launch floor, and the cost of the XLA pads around the kernel."""

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

from sparseeventid_tpu.ops.pallas.window_conv import (
    INVALID_QUERY, TILE_T, _cdiv, _live_tiles, _pad_rows, _padded_table,
    _round_up,
)

from kernel_attrib import make_input, timeit

B, CAP, C = 8, 50000, 32


def main():
    st, r = make_input()
    keys = st.keys()
    feats = st.feats
    qkeys = jnp.asarray(
        r.integers(0, 2**28, (B, 24576, 27)).astype(np.int32))
    start = jnp.zeros((B, 192, 27), jnp.int32)
    w27 = jnp.asarray(r.standard_normal((27, C, C)) * 0.05, jnp.bfloat16)

    # 1. dispatch floor: trivial jit on the same operand set
    f1 = jax.jit(lambda k, f, q, s, w, a: f[:, :1, :1] * 1.0)
    t = timeit(f1, keys, feats, qkeys, start, w27, st.n_active)
    print(f"dispatch floor (trivial jit):    {t:7.2f} ms", flush=True)

    # 2. the pads alone (what window_conv_apply does around the kernel)
    def pads_only(k, f, q, s, w, a):
        pk, pt = _padded_table(k, f)
        n_tiles = _cdiv(q.shape[1], TILE_T)
        qk_p = _pad_rows(q, n_tiles * TILE_T, INVALID_QUERY)
        kc_pad = _round_up(27 * C, 128)
        w2 = jnp.pad(w.reshape(27 * C, C), ((0, kc_pad - 27 * C), (0, 0)))
        return (pt[:, :1, :1].astype(jnp.float32)
                + qk_p[:, :1, :1].astype(jnp.float32)
                + w2[:1, :1].astype(jnp.float32))

    t = timeit(jax.jit(pads_only), keys, feats, qkeys, start, w27,
               st.n_active)
    print(f"pads only:                       {t:7.2f} ms", flush=True)

    # 3. pallas launch floor: empty kernel, tiny blocks, big operands held
    def _empty_kernel(live_ref, out_ref):
        out_ref[...] = jnp.zeros_like(out_ref)

    def empty_pallas(k, f, q, s, w, a, *, grid1):
        live2 = _live_tiles(a, q.shape[1])[:, None]
        out = pl.pallas_call(
            _empty_kernel,
            grid=(B, grid1),
            in_specs=[pl.BlockSpec(live2.shape, lambda bb, i: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda bb, i: (bb, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        )(live2)
        return out

    for g1 in (1, 48, 392):
        t = timeit(jax.jit(functools.partial(empty_pallas, grid1=g1)),
                   keys, feats, qkeys, start, w27, st.n_active)
        print(f"empty pallas grid (8,{g1:3d}):      {t:7.2f} ms", flush=True)

    # 4. empty pallas with the REAL block specs (big VMEM operands staged)
    def _empty2(live_ref, keys_ref, table_ref, qk_ref, start_ref, w_ref,
                out_ref):
        out_ref[...] = jnp.zeros_like(out_ref)

    def empty_real(k, f, q, s, w, a, *, p):
        pk, pt = _padded_table(k, f)
        npad = pk.shape[1]
        m = q.shape[1]
        n_steps = _cdiv(m, TILE_T * p)
        qk_p = _pad_rows(q, n_steps * p * TILE_T, INVALID_QUERY)
        kc_pad = _round_up(27 * C, 128)
        w2 = jnp.pad(w.reshape(27 * C, C).astype(f.dtype),
                     ((0, kc_pad - 27 * C), (0, 0)))
        live2 = _live_tiles(a, m)[:, None]
        out = pl.pallas_call(
            _empty2,
            grid=(B, n_steps),
            in_specs=[
                pl.BlockSpec(live2.shape, lambda bb, i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, npad, 1), lambda bb, i: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npad, C), lambda bb, i: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_T * p, 27), lambda bb, i: (bb, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s.shape[1], 27), lambda bb, i: (bb, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((kc_pad, C), lambda bb, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE_T * p, C),
                                   lambda bb, i: (bb, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n_steps * p * TILE_T, C),
                                           f.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(live2, pk[..., None], pt, qk_p, s, w2)
        return out[:, :m]

    for p in (1, 4):
        t = timeit(jax.jit(functools.partial(empty_real, p=p)),
                   keys, feats, qkeys, start, w27, st.n_active)
        print(f"empty + real blockspecs P={p}:     {t:7.2f} ms", flush=True)

    # 5. variant: drop the qk VMEM operand (move to SMEM? no — just omit)
    def _empty3(live_ref, keys_ref, table_ref, start_ref, w_ref, out_ref):
        out_ref[...] = jnp.zeros_like(out_ref)

    def empty_noqk(k, f, q, s, w, a, *, p):
        pk, pt = _padded_table(k, f)
        npad = pk.shape[1]
        m = q.shape[1]
        n_steps = _cdiv(m, TILE_T * p)
        kc_pad = _round_up(27 * C, 128)
        w2 = jnp.pad(w.reshape(27 * C, C).astype(f.dtype),
                     ((0, kc_pad - 27 * C), (0, 0)))
        live2 = _live_tiles(a, m)[:, None]
        out = pl.pallas_call(
            _empty3,
            grid=(B, n_steps),
            in_specs=[
                pl.BlockSpec(live2.shape, lambda bb, i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, npad, 1), lambda bb, i: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npad, C), lambda bb, i: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s.shape[1], 27), lambda bb, i: (bb, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((kc_pad, C), lambda bb, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE_T * p, C),
                                   lambda bb, i: (bb, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n_steps * p * TILE_T, C),
                                           f.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(live2, pk[..., None], pt, s, w2)
        return out[:, :m]

    t = timeit(jax.jit(functools.partial(empty_noqk, p=4)),
               keys, feats, qkeys, start, w27, st.n_active)
    print(f"empty + blockspecs, no qk P=4:   {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
