#!/usr/bin/env python
"""Empirical Mosaic/MXU cost model at the window-kernel dot shapes.

The window conv's remaining budget splits ~34% skeleton / ~32% one-hot
MXU dot / ~24% VPU compare (PERF_NOTES r2 ablation).  Whether any
repack of the dot can win depends on how Mosaic actually charges for
these shapes: is the contraction dim pass-quantized at 128 (making
R=144 cost the same as R=256)?  Does an N=32 (or M=32) output dim cost
the same as N=128 (3/4 of the MXU idle)?

Method: one pallas_call per shape with grid=(ITERS,), the dot running
once per grid step on VMEM-resident operands, accumulating into the
output block (prevents elision; "arbitrary" semantics).  A second run
at 2*ITERS gives a slope that cancels launch+DMA fixed costs.  Timing
is fenced with a device->host transfer (axon: block_until_ready does
not block, PERF_NOTES gotchas).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = int(os.environ.get("PROBE_ITERS", "8192"))


def _timed(fn, args, reps=7):
    out = fn(*args)
    np.asarray(jax.device_get(out))  # fence
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(out))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def dot_chain(dot_fn, operands, out_shape, iters):
    """pallas_call with grid=(iters,), dot once per step, accumulated."""

    def kernel(*refs):
        *ins, out = refs
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            out[...] = jnp.zeros_like(out)

        vals = [r[...] for r in ins]
        out[...] += dot_fn(*vals).astype(out.dtype)

    in_specs = [pl.BlockSpec(o.shape, lambda i: (0,) * o.ndim) for o in operands]
    call = pl.pallas_call(
        kernel,
        grid=(iters,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(out_shape, lambda i: (0,) * len(out_shape)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    return jax.jit(call)


def slope_ms(dot_fn, operands, out_shape):
    f1 = dot_chain(dot_fn, operands, out_shape, ITERS)
    f2 = dot_chain(dot_fn, operands, out_shape, 2 * ITERS)
    t1 = _timed(f1, operands)
    t2 = _timed(f2, operands)
    return (t2 - t1) / ITERS * 1000.0  # us per dot


def mk(shape, seed):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.normal(size=shape), jnp.bfloat16)


def batched_gather(oh, win):
    # [K,R,T] x [K,R,C] -> [K,C,T]  (two-step CT gather dot)
    return jax.lax.dot_general(
        win, oh, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def flat_dot(a, b):
    # [M,Kdim] x [Kdim,N] -> [M,N]
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def main():
    K, T = 27, 128
    print(f"device: {jax.devices()[0]}  (us per dot, chained slope)")

    print("\n-- batched-K gather dot [K,R,C]x[K,R,T]->[K,C,T], K=27 T=128 --")
    for C in (32, 128):
        for R in (64, 128, 144, 160, 192, 256):
            oh = mk((K, R, T), 1)
            win = mk((K, R, C), 2)
            us = slope_ms(batched_gather, (oh, win), (K, C, T))
            print(f"  C={C:3d} R={R:3d}: {us:8.2f} us")

    print("\n-- wfuse big dot [CO,KR]x[KR,T]->[CO,T] --")
    for CO in (32, 128):
        for R in (128, 144, 160):
            KR = K * R
            a = mk((CO, KR), 3)
            b = mk((KR, T), 4)
            us = slope_ms(flat_dot, (a, b), (CO, T))
            print(f"  CO={CO:3d} R={R:3d} (KR={KR:5d}): {us:8.2f} us")

    print("\n-- N quantization [T,R]x[R,N]->[T,N], R=144 --")
    for N in (8, 32, 64, 128, 256):
        a = mk((T, 144), 5)
        b = mk((144, N), 6)
        us = slope_ms(flat_dot, (a, b), (T, N))
        print(f"  N={N:3d}: {us:8.2f} us")

    print("\n-- M quantization [M,R]x[R,128]->[M,128], R=144 --")
    for M in (8, 32, 64, 128, 256):
        a = mk((M, 144), 7)
        b = mk((144, 128), 8)
        us = slope_ms(flat_dot, (a, b), (M, 128))
        print(f"  M={M:3d}: {us:8.2f} us")

    print("\n-- contraction quantization [128,Rc]x[Rc,128], fine sweep --")
    for Rc in (8, 16, 32, 64, 96, 128, 136, 144, 192, 256, 384, 512):
        a = mk((128, Rc), 9)
        b = mk((Rc, 128), 10)
        us = slope_ms(flat_dot, (a, b), (128, 128))
        print(f"  Rc={Rc:3d}: {us:8.2f} us")

    print("\n-- premult [K,R,C]x[K,C,CO]->[K,R,CO], C=CO=32 --")
    for R in (128, 144, 160):
        a = mk((K, R, 32), 11)
        b = mk((K, 32, 32), 12)

        def premult(win, w):
            return jax.lax.dot_general(
                win, w, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        us = slope_ms(premult, (a, b), (K, R, 32))
        print(f"  R={R:3d}: {us:8.2f} us")


if __name__ == "__main__":
    main()
