#!/usr/bin/env python
"""In-program R sweep of the level-0 series window conv (fwd only).

Chains N conv applies inside ONE jitted program (each consumes the
previous output, so nothing is elided) and reports the per-conv slope —
the calibrated in-step cost, free of the ~3 ms per-executable launch
latency that poisons isolated timings (see scripts/chain_probe.py).
Plans come from the native host builder at each candidate R.

Usage: python scripts/r_sweep_probe.py [R ...]   (default 176 160 128)
"""

# NOTE (round 5): this probe predates the qmeta refactor (commit a0799e0,
# "qmeta query representation") and manipulates the old [B, K, M] qkeys
# plan layout directly.  Its findings are recorded in PERF_NOTES.md and
# final; to re-run it, check out the tree at a0799e0^ or rebuild inputs
# via ops.pallas.window_conv.materialize_qkeys(plan.qmeta, plan.dkeys).

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sparseeventid_tpu import ops
from sparseeventid_tpu.io.hostio import build_window_plans
from sparseeventid_tpu.models.encoder import capacity_schedule
from sparseeventid_tpu.ops import engine as _eng
from sparseeventid_tpu.ops.pallas import window_conv as wc
from sparseeventid_tpu.ops.pallas.window_conv import WINDOW_R_STRIDED

B, CAP, C = 8, 50000, 32
GRID = (1024, 512, 1280)
DEPTH = 5
QB = (int(os.environ["SEID_PROBE_QB"]) if os.environ.get("SEID_PROBE_QB") else None)  # None = frac 1.0 (full grid, like the train step)


def make_input():
    r = np.random.default_rng(0)
    coords = np.full((B, CAP, 3), -1, np.int32)
    feats = np.zeros((B, CAP, 1), np.float32)
    for b in range(B):
        per = 25000 // 40
        pts = []
        for t in range(40):
            start = r.uniform(0.2, 0.8, 3) * np.array(GRID)
            d = r.normal(size=3)
            d /= np.linalg.norm(d)
            steps = np.arange(per)[:, None] * d[None, :] * 2.0
            pts.append(start[None, :] + steps + r.normal(scale=0.6, size=(per, 3)))
        pts = np.concatenate(pts)
        np.clip(pts, 0, np.array(GRID) - 1, out=pts)
        c = np.unique(pts.astype(np.int32), axis=0)
        k = min(len(c), CAP)
        coords[b, :k] = c[:k]
        feats[b, :k, 0] = r.standard_normal(k)
    st = ops.build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats), GRID)
    return st.with_feats(
        jnp.tile(st.feats.astype(jnp.bfloat16), (1, 1, C))
    ), np.asarray(st.coords)


def timeit(fn, *args, iters=12):
    o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    rs = [int(a) for a in sys.argv[1:]] or [176, 160, 128]
    st, coords = make_input()
    caps = capacity_schedule(CAP, DEPTH, 0.5, 1024)
    offs = np.asarray(
        [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
        np.int32,
    )
    qkeys = wc.compute_query_keys(st, offs)
    keys = st.keys()
    w = jnp.asarray(
        np.random.default_rng(1).standard_normal((27, C, C)) * 0.1, jnp.bfloat16
    )

    for r in rs:
        host = build_window_plans(
            coords, GRID, list(caps),
            initial_kernel=(5, 5, 5), series_kernel=(3, 3, 3),
            stride=(2, 2, 2), window_r=r,
            ov_caps=[_eng._overflow_cap(cc, 27) for cc in caps],
            ov_cap_initial=_eng._overflow_cap(caps[0], 125),
            ov_caps_down=[_eng._overflow_cap(cc, 8) for cc in caps[:-1]],
            window_r_down=WINDOW_R_STRIDED,
        )
        start = jnp.asarray(host["lvl0/series/start"])
        nv = int(np.max(np.sum(host["lvl0/series/ov_valid"], axis=1)))

        def chain(n):
            def f(x, qk, s0):
                y = x
                for _ in range(n):
                    y = wc.window_conv_apply(
                        keys, y, qk, s0, w, st.n_active,
                        window_r=r, q_bound=QB,
                    ).astype(jnp.bfloat16)
                return y

            return jax.jit(f)

        qk_t = qkeys.transpose(0, 2, 1)  # [B, K, M] kernel layout
        t1 = timeit(chain(1), st.feats, qk_t, start)
        t8 = timeit(chain(8), st.feats, qk_t, start)
        slope = (t8 - t1) / 7
        print(
            f"R={r:4d}: chain1 {t1:7.2f} ms  chain8 {t8:7.2f} ms  "
            f"per-conv {slope:6.3f} ms  launch~{t1 - slope:5.2f} ms  "
            f"(max ov entries {nv})",
            flush=True,
        )


if __name__ == "__main__":
    main()
