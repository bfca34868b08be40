#!/usr/bin/env python
"""In-chain ablation of the level-0 window conv kernel.

Times chained (N=1 vs N=8) jitted programs of surgically ablated kernel
variants (scripts/kernel_attrib.py's _variant_kernel) and reports per-conv
slopes — the calibrated in-step cost with launch latency and device warmup
removed (a full warm pass runs before any timing; see r_sweep_probe's
warmup-drift lesson).  Variants produce WRONG numerics on purpose.

What each ablation isolates:
  full            stock G=1 legacy-orientation kernel
  static_start    dynamic window starts -> static kk*16 (scalar-core /
                  dynamic-slice issue cost)
  no_compare      skip one-hot generation (VPU compare + [R,T] stores)
  no_stage        skip table window staging ([R,C] copies)
  no_dot          skip the batched [K,R,T]x[K,R,C] one-hot dot
  no_gemm         skip the final [T,KC]x[KC,CO] GEMM
  skeleton        everything off: grid + block DMA + loop skeleton
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

from sparseeventid_tpu.io.hostio import build_window_plans
from sparseeventid_tpu.models.encoder import capacity_schedule
from sparseeventid_tpu.ops import engine as _eng
from sparseeventid_tpu.ops.pallas import window_conv as wc

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from kernel_attrib import variant_apply  # noqa: E402
from r_sweep_probe import make_input, B, CAP, C, GRID, DEPTH  # noqa: E402

R = int(os.environ.get("SEID_WINDOW_R", "160"))


def timeit(fn, *args, iters=12):
    o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    st, coords = make_input()
    caps = capacity_schedule(CAP, DEPTH, 0.5, 1024)
    offs = np.asarray(
        [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
        np.int32,
    )
    qkeys = wc.compute_query_keys(st, offs)
    keys = st.keys()
    w = jnp.asarray(
        np.random.default_rng(1).standard_normal((27, C, C)) * 0.1,
        jnp.bfloat16,
    )
    host = build_window_plans(
        coords, GRID, list(caps),
        initial_kernel=(5, 5, 5), series_kernel=(3, 3, 3),
        stride=(2, 2, 2), window_r=R,
        ov_caps=[_eng._overflow_cap(cc, 27) for cc in caps],
        ov_cap_initial=_eng._overflow_cap(caps[0], 125),
        ov_caps_down=[_eng._overflow_cap(cc, 8) for cc in caps[:-1]],
    )
    start = jnp.asarray(host["lvl0/series/start"])

    variants = [
        ("full", {}),
        ("static_start", dict(static_start=True)),
        ("no_compare", dict(do_compare=False)),
        ("no_stage", dict(do_stage=False)),
        ("no_dot", dict(do_dot=False)),
        ("no_gemm", dict(do_gemm=False)),
        ("skeleton", dict(do_compare=False, do_stage=False, do_dot=False,
                          do_gemm=False)),
    ]

    def chain(n, flags):
        def f(x, qk, s0):
            y = x
            for _ in range(n):
                y = variant_apply(
                    keys, y, qk, s0, w, st.n_active, window_r=R, **flags
                ).astype(jnp.bfloat16)
            return y

        return jax.jit(f)

    # warm the device thoroughly on the full variant before ANY timing
    warm = chain(8, {})
    for _ in range(4):
        _ = float(jnp.sum(warm(st.feats, qkeys, start).astype(jnp.float32)))

    base = None
    for name, flags in variants:
        t1 = timeit(chain(1, flags), st.feats, qkeys, start)
        t8 = timeit(chain(8, flags), st.feats, qkeys, start)
        slope = (t8 - t1) / 7
        if base is None:
            base = slope
        print(
            f"{name:14s} per-conv {slope:6.3f} ms"
            f"   delta vs full {slope - base:+6.3f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
