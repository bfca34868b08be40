#!/usr/bin/env python
"""Localize the window-conv kernel's non-compute floor.

kernel_attrib measured an EMPTY kernel body at 6.0 ms of the 8.4 ms fwd
(bound 24576, P=4): the kernel is streaming/overhead-bound, not
compute-bound.  This probe times write-only pallas kernels that add one
input block stream at a time (qk, table, keys, start) and vary the table
block size, the tiles-per-step P, and the out width, to find which stream
pays the floor.  Bodies are intentionally trivial — timing only.
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

B = 8
MB = 24576          # bounded query rows
TILE_T = 128
K = 27
C = 32
CO = 32
NPAD = 50560 + 384  # level-0 padded table rows


def timeit(fn, *args, iters=20):
    o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


def probe(p, npad, with_qk, with_table, with_keys, with_start, co=CO,
          live_frac=0.7, name=""):
    n_steps = MB // (TILE_T * p)
    n_tiles = n_steps * p
    live = jnp.full((B, 1), int(n_tiles * live_frac), jnp.int32)

    in_specs = [pl.BlockSpec(live.shape, lambda bb, i: (0, 0),
                             memory_space=pltpu.SMEM)]
    args = [live]
    if with_keys:
        in_specs.append(pl.BlockSpec((1, npad, 1), lambda bb, i: (bb, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((B, npad, 1), jnp.int32))
    if with_table:
        in_specs.append(pl.BlockSpec((1, npad, C), lambda bb, i: (bb, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((B, npad, C), jnp.bfloat16))
    if with_qk:
        in_specs.append(
            pl.BlockSpec((1, TILE_T * p, K), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM))
        args.append(jnp.zeros((B, n_tiles * TILE_T, K), jnp.int32))
    if with_start:
        in_specs.append(
            pl.BlockSpec((1, n_tiles, K), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM))
        args.append(jnp.zeros((B, n_tiles, K), jnp.int32))

    def kern(live_ref, *refs):
        out_ref = refs[-1]
        out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

    out = pl.pallas_call(
        kern,
        grid=(B, n_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TILE_T * p, co), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE_T, co),
                                       jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    t = timeit(jax.jit(lambda *a: out(*a)), *args)
    print(f"{name:38s} {t:7.2f} ms   ({n_steps * B} steps)", flush=True)
    return t


def main():
    print(f"bounded rows {MB}, T={TILE_T}, K={K}, C={C}", flush=True)
    # pure grid + out stream
    probe(4, NPAD, 0, 0, 0, 0, name="P=4 out-only")
    probe(8, NPAD, 0, 0, 0, 0, name="P=8 out-only")
    probe(16, NPAD, 0, 0, 0, 0, name="P=16 out-only")
    probe(4, NPAD, 0, 0, 0, 0, co=8, name="P=4 out-only co=8")
    # add streams one at a time (P=4)
    probe(4, NPAD, 1, 0, 0, 0, name="P=4 +qk")
    probe(4, NPAD, 0, 1, 0, 0, name="P=4 +table")
    probe(4, NPAD, 0, 0, 1, 0, name="P=4 +keys")
    probe(4, NPAD, 0, 0, 0, 1, name="P=4 +start(SMEM)")
    probe(4, NPAD, 1, 1, 1, 1, name="P=4 all inputs")
    # table-size scaling (is the invariant block refetched per step?)
    probe(4, NPAD // 4, 0, 1, 0, 0, name="P=4 +table npad/4")
    probe(4, NPAD // 16, 0, 1, 0, 0, name="P=4 +table npad/16")
    # start as SMEM scaling
    probe(8, NPAD, 1, 1, 1, 1, name="P=8 all inputs")


if __name__ == "__main__":
    main()
