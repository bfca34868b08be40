#!/usr/bin/env python
"""Capture a jax.profiler trace of the bench train step and print a
per-op time attribution parsed from the trace events.

The step is conv-dominated (step_split.py: 424.9 ms full step at bench
settings) but the per-tile op-count estimate says the window kernels
should be ~4x faster — this locates where the time actually goes
(Pallas conv/dW/dX kernels per level, XLA transposes, batchnorm,
sidecars, optimizer glue)."""

import dataclasses
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from step_split import make_batch, GRID, MAX_VOXELS
from sparseeventid_tpu.config import load_config
from sparseeventid_tpu.config.schema import LossBalanceScheme
from sparseeventid_tpu.io.hostio import build_window_plans
from sparseeventid_tpu.models import build_sparse_classifier
from sparseeventid_tpu.models.encoder import capacity_schedule
from sparseeventid_tpu.ops import engine as _eng
from sparseeventid_tpu.ops.host_plans import encoder_plans_from_host
from sparseeventid_tpu.ops.pallas.window_conv import WINDOW_R, WINDOW_R_INITIAL, WINDOW_R_STRIDED, window_r_for_level
from sparseeventid_tpu.train import (
    build_lr_schedule,
    build_optimizer,
    create_train_state,
    make_train_step,
)

TRACE_DIR = "/tmp/seid_trace"


def main():
    cfg = load_config(
        "dune3d",
        ["run.minibatch_size=8", "run.precision=bfloat16",
         "framework.remat=false"],
    )
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, max_voxels=MAX_VOXELS)
    )
    model = build_sparse_classifier(cfg)
    st, labels, coords_np = make_batch()
    caps = capacity_schedule(MAX_VOXELS, cfg.encoder.depth,
                             cfg.framework.capacity_shrink,
                             cfg.framework.min_capacity)
    host = build_window_plans(
        coords_np, GRID, list(caps), initial_kernel=(5, 5, 5),
        series_kernel=(3, 3, 3), stride=(2, 2, 2), window_r=WINDOW_R,
        ov_caps=[_eng._overflow_cap(c, 27) for c in caps],
        ov_cap_initial=_eng._overflow_cap(caps[0], 125),
        ov_caps_down=[_eng._overflow_cap(c, 8) for c in caps[:-1]],
        window_r_down=WINDOW_R_STRIDED,
                window_r_initial=WINDOW_R_INITIAL,
                window_r_series=[window_r_for_level(l) for l in range(len(caps))],
    )
    host0 = {k: jnp.asarray(v) for k, v in host.items()}
    depth = cfg.encoder.depth

    def pb(s, h):
        return encoder_plans_from_host(s, h, depth, (5, 5, 5), (3, 3, 3),
                                       (2, 2, 2))

    plans0 = jax.jit(pb)(st, host0)
    lr = build_lr_schedule(cfg.mode.optimizer.lr_schedule, 100, 25)
    optimizer = build_optimizer(cfg.mode.optimizer, lr)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), st,
                               plans0)
    step = jax.jit(make_train_step(model, optimizer, LossBalanceScheme.focal,
                                   lr, plans_builder=pb))

    def run_step(s2):
        ns, m = step(s2, st, labels, host0, jax.random.PRNGKey(1))
        return m["loss/loss"]

    # warm up + compile
    float(run_step(state))
    t0 = time.perf_counter()
    for _ in range(3):
        out = run_step(state)
    float(out)
    print(f"untraced step: {(time.perf_counter() - t0) / 3 * 1000:.1f} ms",
          flush=True)

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(2):
        out = run_step(state)
    float(out)
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    # parse the trace
    files = glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("NO TRACE FILES; dir contents:")
        for p in glob.glob(TRACE_DIR + "/**/*", recursive=True):
            print(" ", p)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device-side lanes: pid/tid names
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        dur = e.get("dur", 0) / 1000.0  # us -> ms
        nm = e.get("name", "?")
        by_op[nm] += dur
        total += dur
    print(f"\ndevice lanes: {sorted(set(names.values()))}")
    print(f"total device time in trace: {total:.1f} ms (2 steps)")
    for nm, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:45]:
        print(f"  {ms / 2:8.2f} ms  {nm[:110]}")


if __name__ == "__main__":
    main()
