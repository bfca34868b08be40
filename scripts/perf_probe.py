#!/usr/bin/env python
"""Quick conv fwd / fwd+bwd timing probe at dune3d level-0 scale (bf16),
plans passed as jit arguments (the production calling convention)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sparseeventid_tpu import ops
from sparseeventid_tpu.ops import engine
from sparseeventid_tpu.ops.pallas.window_engine import (
    build_submanifold_window_plan,
    window_submanifold_conv,
)

B, CAP, C = 8, 50000, 32
GRID = (1024, 512, 1280)


def main():
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
    st = st.with_feats(st.feats.astype(jnp.bfloat16))
    w = jnp.asarray(r.standard_normal((27, C, C)) * 0.05, jnp.bfloat16)
    t0 = time.time()
    plan = jax.jit(
        lambda s: build_submanifold_window_plan(
            s, (3, 3, 3), overflow_cap=engine._overflow_cap(s.capacity)
        )
    )(st)
    print(f"plan built {time.time()-t0:.0f}s", flush=True)

    def loss_arg(ww, f, s, p):
        o = window_submanifold_conv(s.with_feats(f), p, ww)
        return jnp.sum(o.feats.astype(jnp.float32))

    g = jax.jit(jax.grad(loss_arg, argnums=(0, 1)))
    t0 = time.time()
    gw, gf = g(w, st.feats, st, plan)
    print(
        f"grad run OK {float(jnp.sum(gw.astype(jnp.float32))):.1f} "
        f"(compile+run {time.time()-t0:.0f}s)",
        flush=True,
    )
    for _ in range(2):
        gw, gf = g(w, st.feats, st, plan)
    _ = float(jnp.sum(gw.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(5):
        gw, gf = g(w, st.feats, st, plan)
    _ = float(jnp.sum(gw.astype(jnp.float32)))
    print(f"conv fwd+bwd: {(time.perf_counter()-t0)/5*1000:.1f} ms", flush=True)

    f2 = jax.jit(
        lambda f, p: jnp.sum(
            window_submanifold_conv(st.with_feats(f), p, w).feats.astype(
                jnp.float32
            )
        )
    )
    v = float(f2(st.feats, plan))
    t0 = time.perf_counter()
    for _ in range(5):
        v = f2(st.feats, plan)
    float(v)
    print(f"conv fwd: {(time.perf_counter()-t0)/5*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
