#!/usr/bin/env python
"""Calibrated kernel-variant timing via in-program chains.

chain_probe established ~2.8 ms per-executable launch latency on axon and
negligible per-grid-step cost — so every isolated single-call microbench
overstated kernel cost by ~2.8 ms and mis-ranked variants whose true cost
is a few ms.  This script times candidate conv-kernel configurations as
N=8 chained calls inside ONE jitted program (slope = true in-program
cost): G (offset grouping), P (tiles/step), WINDOW_R, and an all-f32
variant (tests whether the i1->bf16 relayout of the compare dominates).

Uses host-built plans (fast).  Numerics of R<176 variants are wrong on
purpose (starts computed for R=176) — timing only.
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

from sparseeventid_tpu import ops
from sparseeventid_tpu.config import load_config
from sparseeventid_tpu.io.hostio import build_window_plans
from sparseeventid_tpu.models.encoder import capacity_schedule
from sparseeventid_tpu.ops import engine as _eng
from sparseeventid_tpu.ops.host_plans import encoder_plans_from_host
from sparseeventid_tpu.ops.pallas import window_conv as wc

GRID = (1024, 512, 1280)
MAX_VOXELS = 50000
ACTIVE = 20000
B = 8
N_CHAIN = 8


def make_coords():
    r = np.random.default_rng(0)
    coords = np.full((B, MAX_VOXELS, 3), -1, np.int32)
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
        coords[b, : min(len(cc), MAX_VOXELS)] = cc[:MAX_VOXELS]
    return coords


def timeit(fn, *args, iters=10):
    o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    cfg = load_config("dune3d", ["run.minibatch_size=8"])
    depth = cfg.encoder.depth
    caps = capacity_schedule(MAX_VOXELS, depth,
                             cfg.framework.capacity_shrink,
                             cfg.framework.min_capacity)
    coords = make_coords()
    host = build_window_plans(
        coords, GRID, list(caps), initial_kernel=(5, 5, 5),
        series_kernel=(3, 3, 3), stride=(2, 2, 2),
        window_r=wc.WINDOW_R,
        ov_caps=[_eng._overflow_cap(c, 27) for c in caps],
        ov_cap_initial=_eng._overflow_cap(caps[0], 125),
        ov_caps_down=[_eng._overflow_cap(c, 8) for c in caps[:-1]],
        window_r_down=wc.WINDOW_R_STRIDED,
    )
    host = {k: jnp.asarray(v) for k, v in host.items()}
    from sparseeventid_tpu.models.encoder import GRID_QUANTUM, _round_up

    st0 = ops.build_sparse_tensor(
        jnp.asarray(coords), jnp.ones((B, MAX_VOXELS, 1), jnp.bfloat16),
        GRID,
        capacity=_round_up(MAX_VOXELS, GRID_QUANTUM),
    )
    plans = jax.jit(functools.partial(
        encoder_plans_from_host, depth=depth, initial_kernel=(5, 5, 5),
        series_kernel=(3, 3, 3), stride=(2, 2, 2),
        q_bound_frac=0.5, q_bound_growth=1.6,
    ))(st0, host)
    r = np.random.default_rng(1)
    keys0 = st0.keys()
    sp = plans.series[0]
    w27 = jnp.asarray(r.standard_normal((27, 32, 32)) * 0.05, jnp.bfloat16)
    f32_feats = jnp.asarray(
        r.standard_normal((B, MAX_VOXELS, 32)) * 0.1, jnp.bfloat16)

    def run_series(name, env=None, window_r=176):
        saved = {}
        env = env or {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v

        def chain(n):
            def f(x):
                for _ in range(n):
                    x = wc.window_conv_apply(
                        keys0, x, sp.qkeys, sp.start, w27, sp.q_active,
                        window_r=window_r, q_bound=sp.q_bound,
                    )
                return x
            return jax.jit(f)

        t1 = timeit(chain(1), f32_feats)
        t8 = timeit(chain(N_CHAIN), f32_feats)
        s = (t8 - t1) / (N_CHAIN - 1)
        print(f"{name:34s} slope {s:6.2f} ms  (t1 {t1:6.2f})", flush=True)
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        return s

    print("series conv K=27 C=32 bound 24576:", flush=True)
    run_series("stock (CT, G=1, P=4)")
    run_series("legacy orient (SEID_CT=0)", env={"SEID_CT": "0"})
    run_series("CT, P=1", env={"SEID_P": "1"})
    run_series("CT R=160", window_r=160)
    run_series("CT R=144", window_r=144)
    run_series("CT R=128", window_r=128)
    run_series("CT R=112", window_r=112)

    # initial conv shapes: K=125, C=1 -> CO=32
    ip = plans.initial
    w125 = jnp.asarray(r.standard_normal((125, 1, 32)) * 0.05, jnp.bfloat16)
    f1 = jnp.ones((B, MAX_VOXELS, 1), jnp.bfloat16)

    def run_initial(name, env=None):
        saved = {}
        env = env or {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v

        def chain(n):
            def f(x):
                y = None
                for _ in range(n):
                    y = wc.window_conv_apply(
                        keys0, x, ip.qkeys, ip.start, w125, ip.q_active,
                        window_r=176, q_bound=ip.q_bound,
                    )
                    x = y[:, :, :1]
                return y
            return jax.jit(f)

        # K=125 bodies are huge; N=8 chains time out the compile service
        t1 = timeit(chain(1), f1)
        t8 = timeit(chain(3), f1)
        s = (t8 - t1) / 2
        print(f"{name:34s} slope {s:6.2f} ms  (t1 {t1:6.2f})", flush=True)
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    print("initial conv K=125 C=1->32 bound 24576:", flush=True)
    run_initial("stock (G=1, P=1)")
    run_initial("P=4", env={"SEID_P": "4"})

    # dW kernel at series shapes
    gy = jnp.asarray(r.standard_normal((B, MAX_VOXELS, 32)) * 0.1,
                     jnp.bfloat16)

    def run_dw(name, env=None):
        saved = {}
        env = env or {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v

        def chain(n):
            def f(x, g):
                acc = jnp.zeros((27, 32, 32), jnp.float32)
                for i in range(n):
                    acc = acc + wc.window_dw(
                        keys0, x, sp.qkeys, sp.start,
                        g + jnp.bfloat16(i), sp.q_active,
                        window_r=176, q_bound=sp.q_bound,
                    )
                return acc
            return jax.jit(f)

        t1 = timeit(chain(1), f32_feats, gy)
        t8 = timeit(chain(N_CHAIN), f32_feats, gy)
        s = (t8 - t1) / (N_CHAIN - 1)
        print(f"{name:34s} slope {s:6.2f} ms  (t1 {t1:6.2f})", flush=True)
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    print("dW kernel K=27 C=32 bound 24576:", flush=True)
    run_dw("stock dw (CT, G=1, P=4)")
    run_dw("dw legacy orient", env={"SEID_CT": "0"})


if __name__ == "__main__":
    main()
