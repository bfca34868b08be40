#!/usr/bin/env python
"""Component-level timing of the dune3d train step on the real TPU.

Times, per pyramid level (capacity, channels from the dune3d recipe):
  - submanifold window-plan build (per block series)
  - window conv forward
  - window conv forward+backward
  - downsample site build + strided plans
plus the full train step, so the step budget can be reconciled.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparseeventid_tpu import ops
from sparseeventid_tpu.models.encoder import capacity_schedule
from sparseeventid_tpu.ops import engine
from sparseeventid_tpu.ops.pallas.window_engine import (
    build_submanifold_window_plan,
    window_submanifold_conv,
)

GRID = (1024, 512, 1280)
BATCH = 8
ACTIVE = 25000


def make_coords(r, grid, n):
    n_tracks = 40
    per = n // n_tracks
    pts = []
    for t in range(n_tracks):
        start = r.uniform(0.2, 0.8, 3) * np.array(grid)
        d = r.normal(size=3)
        d /= np.linalg.norm(d)
        steps = np.arange(per)[:, None] * d[None, :] * 2.0
        pts.append(start[None, :] + steps + r.normal(scale=0.6, size=(per, 3)))
    pts = np.concatenate(pts)
    np.clip(pts, 0, np.array(grid) - 1, out=pts)
    return np.unique(pts.astype(np.int32), axis=0)


def _scalarize(fn):
    """Wrap fn so jit returns one f32 scalar — keeps the timing fence from
    paying a full-array transfer over the axon tunnel."""

    def wrapped(*args):
        out = fn(*args)
        return sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(out)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.number)
        )

    return wrapped


def timeit(fn, *args, iters=5):
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def main():
    r = np.random.default_rng(0)
    caps = capacity_schedule(50000, 5, 0.5, 1024)
    print("capacity schedule:", caps)

    # build the level-0 tensor, then the site pyramid via downsample_sites
    coords = np.full((BATCH, caps[0], 3), -1, np.int32)
    for b in range(BATCH):
        c = make_coords(np.random.default_rng(b), GRID, ACTIVE)
        coords[b, : len(c)] = c[: caps[0]]
    feats = np.zeros((BATCH, caps[0], 1), np.float32)
    feats[..., 0] = (coords[..., 0] >= 0).astype(np.float32)
    st = ops.build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats), GRID)
    st = st.with_feats(st.feats.astype(jnp.bfloat16))

    # channel progression: 32 init, +32 per level (additive growth)
    chans = [32, 64, 96, 128, 160, 192]
    grid = list(GRID)
    level_st = st
    for lvl in range(6):
        c_in = chans[lvl]
        n_act = int(np.asarray(level_st.n_active).mean())
        feats = jnp.asarray(
            np.random.default_rng(1).standard_normal(
                (BATCH, level_st.capacity, c_in)
            ),
            jnp.bfloat16,
        )
        lst = level_st.with_feats(feats)
        w = jnp.asarray(
            np.random.default_rng(2).standard_normal((27, c_in, c_in)) * 0.05,
            jnp.bfloat16,
        )

        plan_builder = lambda s: build_submanifold_window_plan(
            s, (3, 3, 3), overflow_cap=engine._overflow_cap(s.capacity)
        )
        t_plan = timeit(jax.jit(_scalarize(plan_builder)), lst)
        plan = jax.jit(plan_builder)(lst)

        fwd = jax.jit(
            _scalarize(lambda s, p, ww: window_submanifold_conv(s, p, ww).feats)
        )
        t_fwd = timeit(fwd, lst, plan, w)

        def loss(ww, f, s, p):
            return jnp.sum(
                window_submanifold_conv(s.with_feats(f), p, ww)
                .feats.astype(jnp.float32)
            )

        g = jax.jit(_scalarize(jax.grad(loss, argnums=(0, 1))))
        t_bwd = timeit(g, w, lst.feats, lst, plan)

        print(
            f"level {lvl}: cap={lst.capacity} n_act~{n_act} C={c_in} | "
            f"plan {t_plan:.1f} ms, conv fwd {t_fwd:.1f} ms, "
            f"conv fwd+bwd {t_bwd:.1f} ms"
        )

        if lvl < 5:
            down_builder = lambda s, oc=caps[lvl + 1]: engine.build_downsample_plan(
                s, (2, 2, 2), out_capacity=oc, backend=engine.WINDOW
            )
            t_down = timeit(jax.jit(_scalarize(down_builder)), lst)
            skeleton, dplans, dropped = jax.jit(down_builder)(lst)
            print(f"  downsample build (sites + fwd/rev plans): {t_down:.1f} ms")
            level_st = skeleton
            grid = [max(1, g2 // 2) for g2 in grid]


if __name__ == "__main__":
    main()
