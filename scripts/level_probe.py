#!/usr/bin/env python
"""Per-level fused fwd+bwd conv timings on the real encoder pyramid.

Uses host-built plans (fast) for the bench batch, then times
window_submanifold_conv / window_strided_conv value+grad per level under
kernel variants selected by env (SEID_P, SEID_NO_GROUP), so the regression
seen end-to-end (but not in the level-0-only microbench) can be localized.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sparseeventid_tpu import ops
from sparseeventid_tpu.config import load_config
from sparseeventid_tpu.io.hostio import build_window_plans
from sparseeventid_tpu.models.encoder import capacity_schedule
from sparseeventid_tpu.ops import engine as _eng
from sparseeventid_tpu.ops.host_plans import encoder_plans_from_host
from sparseeventid_tpu.ops.pallas.window_conv import WINDOW_R, WINDOW_R_INITIAL, WINDOW_R_STRIDED, window_r_for_level
from sparseeventid_tpu.ops.pallas.window_engine import (
    window_strided_conv, window_submanifold_conv,
)

GRID = (1024, 512, 1280)
MAX_VOXELS = 50000
ACTIVE_VOXELS = 25000
B = 8
CHANNELS = [32, 64, 96, 128, 160, 192]  # additive growth from 32


def make_batch():
    r = np.random.default_rng(0)
    coords = np.full((B, MAX_VOXELS, 3), -1, np.int32)
    for b in range(B):
        per = ACTIVE_VOXELS // 40
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
        coords[b, : min(len(cc), MAX_VOXELS)] = cc[:MAX_VOXELS]
    return coords


def timeit_scalar(fn, *args, iters=8):
    v = fn(*args)
    _ = float(jax.tree_util.tree_leaves(v)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        v = fn(*args)
    _ = float(jax.tree_util.tree_leaves(v)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    cfg = load_config("dune3d", ["run.minibatch_size=8"])
    depth = cfg.encoder.depth
    caps = capacity_schedule(
        MAX_VOXELS, depth, cfg.framework.capacity_shrink,
        cfg.framework.min_capacity,
    )
    coords = make_batch()
    host = build_window_plans(
        coords, GRID, list(caps),
        initial_kernel=(5, 5, 5), series_kernel=(3, 3, 3), stride=(2, 2, 2),
        window_r=WINDOW_R,
        ov_caps=[_eng._overflow_cap(cc, 27) for cc in caps],
        ov_cap_initial=_eng._overflow_cap(caps[0], 125),
        ov_caps_down=[_eng._overflow_cap(cc, 8) for cc in caps[:-1]],
        window_r_down=WINDOW_R_STRIDED,
                window_r_initial=WINDOW_R_INITIAL,
                window_r_series=[window_r_for_level(l) for l in range(len(caps))],
    )
    host = {k: jnp.asarray(v) for k, v in host.items()}
    from sparseeventid_tpu.models.encoder import GRID_QUANTUM, _round_up

    st0 = ops.build_sparse_tensor(
        jnp.asarray(coords),
        jnp.ones((B, MAX_VOXELS, 1), jnp.bfloat16), GRID,
        capacity=_round_up(MAX_VOXELS, GRID_QUANTUM),
    )
    qb = float(os.environ.get("PROBE_QBOUND", "0"))
    plans = jax.jit(functools.partial(
        encoder_plans_from_host, depth=depth, initial_kernel=(5, 5, 5),
        series_kernel=(3, 3, 3), stride=(2, 2, 2),
        q_bound_frac=qb if qb > 0 else 1.0,
    ))(st0, host)
    levels = [st0] + list(plans.skeletons)
    r = np.random.default_rng(1)

    def subm_loss(w, f, st, plan):
        o = window_submanifold_conv(st.with_feats(f), plan, w)
        return jnp.sum(o.feats.astype(jnp.float32))

    def strided_loss(w, f, st, skel, fp, rp):
        o = window_strided_conv(st.with_feats(f), skel, fp, rp, w)
        return jnp.sum(o.feats.astype(jnp.float32))

    g_subm = jax.jit(jax.grad(subm_loss, argnums=(0, 1)))
    g_str = jax.jit(jax.grad(strided_loss, argnums=(0, 1)))

    total = 0.0
    # initial conv (C=1 -> 32, K=125)
    w = jnp.asarray(r.standard_normal((125, 1, 32)) * 0.05, jnp.bfloat16)
    f = st0.feats
    t = timeit_scalar(g_subm, w, f, st0, plans.initial)
    total += t
    print(f"initial K=125 C=1->32:   {t:7.2f} ms", flush=True)

    for l in range(depth + 1):
        c = CHANNELS[l]
        st = levels[l]
        f = jnp.asarray(
            r.standard_normal((B, st.capacity, c)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(r.standard_normal((27, c, c)) * 0.05, jnp.bfloat16)
        t = timeit_scalar(g_subm, w, f, st, plans.series[l])
        total += t
        print(f"series l={l} cap={st.capacity:6d} C={c:3d}: {t:7.2f} ms",
              flush=True)

    for l in range(depth):
        c, cn = CHANNELS[l], CHANNELS[l + 1]
        st, skel = levels[l], levels[l + 1]
        f = jnp.asarray(
            r.standard_normal((B, st.capacity, c)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(r.standard_normal((8, c, cn)) * 0.05, jnp.bfloat16)
        fp, rp = plans.down[l]
        t = timeit_scalar(g_str, w, f, st, skel, fp, rp)
        total += t
        print(f"down   l={l} cap={st.capacity:6d} C={c:3d}->{cn:3d}:"
              f" {t:7.2f} ms", flush=True)
    print(f"TOTAL (1 conv each):     {total:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
