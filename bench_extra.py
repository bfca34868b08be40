#!/usr/bin/env python
"""Throughput for the four non-flagship BASELINE.json configs
(VERDICT r2 missing #4): 2D multiplane sparse ResNet (dune2d recipe),
2D single-plane, PointNet, DGCNN.

One JSON line per config (same shape as bench.py's), driving the REAL
production path: Trainer._build_training + BatchLoader prefetch (host
plans in the prefetch thread for the sparse configs), larcv files at
detector scale generated on first use.  bench.py stays the headline
dune3d number; this is the coverage table.

Usage: python bench_extra.py [config ...]   (default: all four)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WARMUP = 6
ITERS = 10
BLOCKS = 3

FILES = {
    # (path, image_size, dimension, mean_tracks, steps, max_vox, n_events)
    "dune2d": ("/tmp/dune2d_synth.h5", (3, 1536, 1024), 2, 40.0, 900, 20000, 128),
    "dune2d_single": ("/tmp/dune2d_single_synth.h5", (1, 1536, 1024), 2, 40.0, 900, 20000, 128),
    "dune3d": ("/tmp/dune3d_synth.h5", (1024, 512, 1280), 3, 40.0, 900, 50000, 128),
}

CONFIGS = {
    # name -> (recipe, overrides, data file key)
    "dune2d_multiplane": (
        "dune2d",
        ["encoder.plane_merge_depth=2"],  # legacy merge topology
        "dune2d",
    ),
    "dune2d_singleplane": ("dune2d", ["data.images=1"], "dune2d_single"),
    "pointnet": ("dune3d", ["encoder=pointnet"], "dune3d"),
    "dgcnn": ("dune3d", ["encoder=dgcnn"], "dune3d"),
    # SimCLR at detector scale (VERDICT r3 missing #3): augmented views run
    # at the reference's MaxVoxels=3000 view budget (larcv_fetcher.py:182),
    # per-view host plans built per draw (uncacheable by design)
    "simclr": (
        "dune3d",
        ["name=simclr", "data.transform1=true", "data.transform2=true"],
        "dune3d",
    ),
    # vertex finding + unsupervised event ID at detector scale (the last
    # two reference tasks without an e2e throughput number)
    "vertex": ("dune3d", ["name=yolo"], "dune3d"),
    "unsupervised": ("dune3d", ["name=unsupervised_eventID"], "dune3d"),
}


def ensure_file(key):
    from sparseeventid_tpu.io.larcv import write_synthetic_larcv_file

    path, size, dim, tracks, steps, mv, n = FILES[key]
    if not os.path.exists(path):
        print(f"# generating {path} ...", file=sys.stderr)
        write_synthetic_larcv_file(
            path, n_events=n, image_size=size, seed=77, dimension=dim,
            mean_tracks=tracks, steps_per_track=steps, max_voxels=mv,
        )
    return path


def bench_one(name):
    import jax
    import numpy as np

    from sparseeventid_tpu.config import load_config

    recipe, overrides, fkey = CONFIGS[name]
    path = ensure_file(fkey)
    cfg = load_config(
        recipe,
        overrides
        + [
            f"data.train={path}",
            "data.active=[train]",
            "run.minibatch_size=8",
            "run.precision=bfloat16",
            "run.distributed=false",
            "framework.remat=false",
            f"run.id=bench_extra_{name}",
            "output_dir=/tmp/bench_extra_out",
        ],
    )
    from sparseeventid_tpu.train.trainer import Trainer

    t = Trainer(cfg)
    state, train_step, eval_step, n_steps, prepare = t._build_training()
    loader = t._loader("train")
    rng = jax.random.PRNGKey(7)

    def one_step(state):
        args = prepare(next(loader))
        state, metrics = train_step(state, *args, rng)
        return state, metrics

    dropped = 0
    for _ in range(WARMUP):
        state, metrics = one_step(state)
    # axon: block_until_ready does not block; force a host transfer
    _ = float(metrics["loss/loss"])
    dropped = int(np.asarray(metrics.get("overflow/dropped", 0)))

    rates = []
    for _ in range(BLOCKS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = one_step(state)
        _ = float(metrics["loss/loss"])
        dt = (time.perf_counter() - t0) / ITERS
        rates.append(cfg.run.minibatch_size / dt)
    t._shutdown()
    ev_s = float(np.median(rates))
    print(
        json.dumps(
            {
                "metric": f"{name}_train_events_per_sec_per_chip",
                "value": round(ev_s, 2),
                "unit": "events/s",
                "vs_baseline": None,  # reference publishes no numbers for these
                "blocks": [round(r, 2) for r in rates],
                "overflow_dropped": dropped,
                "config": {
                    "batch": int(cfg.run.minibatch_size),
                    "recipe": recipe,
                    "overrides": overrides,
                    "end_to_end": True,  # includes loader + host plans
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    names = sys.argv[1:] or list(CONFIGS)
    for n in names:
        bench_one(n)
