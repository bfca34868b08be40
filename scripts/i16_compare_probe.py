#!/usr/bin/env python
"""Does Mosaic run 16-bit integer compares at 2x VPU throughput?

The window kernel's one-hot generation (VPU compare + select to bf16,
~24% of kernel time at P=1, PERF_NOTES r2 ablation) compares i32 window
keys against i32 query keys.  Window-RELATIVE keys fit in i16 (spans are
~1.6-4k << 32k), so if the VPU packs i16 lanes 2x, the compare half of
one-hot generation halves.

Chained in-Pallas microbench: each grid step generates oh[R, T] from
(win==qt) in i32 / i16 / (i32 compare, bf16 store) and accumulates a
reduction so nothing folds away.  Times the compare+select+store complex
only — no dots, no DMA variation.
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

R, T, K = 144, 128, 27
STEPS = 4096


def make_kernel(dtype):
    # NOTE: win operand is [R, K] (not [K, R]): Mosaic rejects inserting a
    # minor dim on 16-bit vectors ("not a no-op only supported for 32-bit
    # types"), so the [R, 1] window column must come from a 2D slice, and
    # the [1, T] query row likewise.
    def kern(win_ref, qt_ref, out_ref, acc):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            acc[...] = jnp.zeros_like(acc)

        w = win_ref[...]  # [R, K] of dtype
        q = qt_ref[...]  # [K, T]
        s = jnp.zeros((R, T), jnp.float32)
        for k in range(K):
            oh = (w[:, k:k + 1] == q[k:k + 1, :]).astype(jnp.bfloat16)
            s = s + oh.astype(jnp.float32)
        acc[...] += s

        @pl.when(step == STEPS - 1)
        def _out():
            out_ref[...] = acc[...]

    return kern


def run(dtype, win, qt):
    f = pl.pallas_call(
        make_kernel(dtype),
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec(win.shape, lambda i: (0, 0)),
            pl.BlockSpec(qt.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, T), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, T), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, T), jnp.float32)],
    )
    g = jax.jit(f)
    o = g(win, qt)
    _ = float(jnp.sum(o))
    t0 = time.perf_counter()
    for _ in range(5):
        o = g(win, qt)
    _ = float(jnp.sum(o))
    dt = (time.perf_counter() - t0) / 5
    per_step_us = dt / STEPS * 1e6
    return per_step_us


def main():
    r = np.random.default_rng(0)
    base = r.integers(0, 3000, (R, K)).astype(np.int32)
    qt32 = r.integers(0, 3000, (K, T)).astype(np.int32)
    win16 = jnp.asarray(base.astype(np.int16))
    qt16 = jnp.asarray(qt32.astype(np.int16))
    win32 = jnp.asarray(base)
    qt32j = jnp.asarray(qt32)

    a = run(jnp.int32, win32, qt32j)
    b = run(jnp.int16, win16, qt16)
    print(f"i32 compare+onehot: {a:7.3f} us/step ({K}x[{R},{T}])")
    print(f"i16 compare+onehot: {b:7.3f} us/step   ratio {a/b:.2f}x")


if __name__ == "__main__":
    main()
