#!/usr/bin/env python
"""End-to-end dune3d training throughput attribution (VERDICT r2 missing #3).

Times, on the REAL production path at bench geometry (batch 8, dune3d
recipe, window backend + host plans):
  1. host read+assembly per batch (LarcvDataset.batch)
  2. host plan build per batch (Trainer._compute_host_plans)
  3. the full Trainer loop ev/s through BatchLoader prefetch
so the loader-vs-device occupancy question (reference analog: larcv3's
prepare_next keeping devices busy, larcv_fetcher.py:403-413) is answered
with numbers instead of the round-2 estimate.

Single-core host: plan building cannot be parallelized away — it must
either be cheaper than the device step or overlap with async dispatch.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FILE = "/tmp/dune3d_synth.h5"
BATCH = 8


def main():
    import numpy as np

    from sparseeventid_tpu.config import load_config
    from sparseeventid_tpu.io.larcv import write_synthetic_larcv_file

    if not os.path.exists(FILE):
        write_synthetic_larcv_file(
            FILE, n_events=128, image_size=(1024, 512, 1280), seed=77,
            mean_tracks=40.0, steps_per_track=900, max_voxels=50000,
        )

    cfg = load_config(
        "dune3d",
        [
            f"data.train={FILE}",
            "data.active=[train]",
            "run.minibatch_size=8",
            "run.precision=bfloat16",
            "run.distributed=false",
            "framework.remat=false",
            "run.id=e2e_probe",
            "output_dir=/tmp/e2e_out",
        ],
    )
    from sparseeventid_tpu.train.trainer import Trainer

    t = Trainer(cfg)

    # --- host-side costs, measured without the device in the loop ---
    ds = t.datasets["train"]
    idx = np.arange(BATCH)
    for _ in range(2):
        batch = ds.batch(idx)  # warm the file cache
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        batch = ds.batch(idx)
    read_ms = (time.perf_counter() - t0) / reps * 1e3

    plans = t._compute_host_plans(batch["image"])  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        plans = t._compute_host_plans(batch["image"])
    plan_ms = (time.perf_counter() - t0) / reps * 1e3
    print(
        f"host read+assembly: {read_ms:7.1f} ms/batch ({read_ms/BATCH:.1f} ms/event)\n"
        f"host plan build:    {plan_ms:7.1f} ms/batch ({plan_ms/BATCH:.1f} ms/event)",
        flush=True,
    )

    # --- full trainer loop through BatchLoader prefetch ---
    import jax

    state, train_step, eval_step, n_steps, prepare = t._build_training()
    loader = t._loader("train")
    rng = jax.random.PRNGKey(7)

    def one_step(state):
        args = prepare(next(loader))
        state, metrics = train_step(state, *args, rng)
        return state, metrics

    for _ in range(6):
        state, metrics = one_step(state)
    _ = float(metrics["loss/loss"])  # axon: force host transfer

    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            state, metrics = one_step(state)
        _ = float(metrics["loss/loss"])
        dt = (time.perf_counter() - t0) / iters
        rates.append(BATCH / dt)
    dropped = int(np.asarray(metrics.get("overflow/dropped", 0)))
    t._shutdown()
    print(
        json.dumps(
            {
                "metric": "dune3d_e2e_train_events_per_sec_per_chip",
                "value": round(float(np.median(rates)), 2),
                "unit": "events/s",
                "blocks": [round(r, 2) for r in rates],
                "host_read_ms_per_batch": round(read_ms, 1),
                "host_plan_ms_per_batch": round(plan_ms, 1),
                "overflow_dropped": dropped,
                "end_to_end": True,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
