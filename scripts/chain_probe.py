#!/usr/bin/env python
"""Separate per-EXECUTABLE launch latency from true in-program kernel cost.

stream_probe measured ~2.9 ms for an empty write-only kernel — suspicious
of a fixed per-launch cost on the axon tunnel rather than real kernel
time.  Here we time ONE jitted program containing N chained kernel calls
(each consumes the previous output, so no CSE/elision) for N=1 and N=8:
the slope is the true in-program cost, the intercept the launch latency.
Run for (a) an empty write-through kernel and (b) the real level-0
window conv.  This calibrates every isolated microbench in this repo.
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

B, CAP, C = 8, 50000, 32
GRID = (1024, 512, 1280)
TILE_T = 128
P = 4
MB = 24576


def timeit(fn, *args, iters=20):
    o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


def empty_chain(n):
    """n chained write-through kernels (grid like the bounded conv)."""
    n_steps = MB // (TILE_T * P)

    def kern(x_ref, o_ref):
        o_ref[0] = x_ref[0] + jnp.bfloat16(1)

    call = pl.pallas_call(
        kern,
        grid=(B, n_steps),
        in_specs=[pl.BlockSpec((1, TILE_T * P, C), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TILE_T * P, C), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, MB, C), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def f(x):
        for _ in range(n):
            x = call(x)
        return x

    return jax.jit(f)


def conv_chain(n, keys, plan, w):
    """n chained real window convs (out feeds next conv's features)."""

    def f(feats):
        x = feats
        for _ in range(n):
            x = wc.window_conv_apply(
                keys, x, plan.qmeta, plan.start, w, plan.q_active,
                plan.dkeys, window_r=176, q_bound=plan.q_bound,
            )
        return x

    return jax.jit(f)


def main():
    x0 = jnp.zeros((B, MB, C), jnp.bfloat16)
    t1 = timeit(empty_chain(1), x0)
    t8 = timeit(empty_chain(8), x0)
    print(f"empty chain: N=1 {t1:.2f} ms, N=8 {t8:.2f} ms, "
          f"slope {(t8 - t1) / 7:.3f} ms/call, intercept "
          f"{t1 - (t8 - t1) / 7:.2f} ms", flush=True)

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
            pts.append(start[None, :] + steps
                       + r.normal(scale=0.6, size=(per, 3)))
        pts = np.concatenate(pts)
        np.clip(pts, 0, np.array(GRID) - 1, out=pts)
        cc = np.unique(pts.astype(np.int32), axis=0)
        coords[b, : min(len(cc), CAP)] = cc[:CAP]
    st = ops.build_sparse_tensor(
        jnp.asarray(coords),
        jnp.asarray(r.standard_normal((B, CAP, C)).astype(np.float32)),
        GRID,
    ).with_feats(jnp.zeros((B, CAP, C), jnp.bfloat16))
    print("building plan (~2 min device fallback)...", flush=True)
    plan = jax.jit(
        lambda s: build_submanifold_window_plan(
            s, (3, 3, 3), overflow_cap=engine._overflow_cap(s.capacity),
            q_bound=MB,
        )
    )(st)
    _ = float(jnp.sum(plan.start))
    keys = st.keys()
    w = jnp.asarray(r.standard_normal((27, C, C)) * 0.05, jnp.bfloat16)

    f1 = conv_chain(1, keys, plan, w)
    f8 = conv_chain(8, keys, plan, w)
    c1 = timeit(f1, st.feats)
    c8 = timeit(f8, st.feats)
    print(f"conv chain:  N=1 {c1:.2f} ms, N=8 {c8:.2f} ms, "
          f"slope {(c8 - c1) / 7:.3f} ms/call, intercept "
          f"{c1 - (c8 - c1) / 7:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
