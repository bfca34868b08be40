#!/usr/bin/env python
"""End-to-end dune3d training throughput artifact (VERDICT r3 task #2).

Produces BENCH_e2e.json with driver-diffable numbers for the FULL
production path (BatchLoader prefetch -> host plans + cache -> device
step) at full dune3d occupancy (~36k active voxels/event, heavier than
bench.py's 25k):

  * cold_epoch_ev_s   — epoch 1, plan cache filling (the plan-build-bound
                        regime; reference analog: larcv3 prepare_next,
                        /root/reference/src/io/larcv_fetcher.py:403-413)
  * warm_epoch_ev_s   — epochs >= 2, plans served from io/plan_cache.py
  * device_only_ev_s  — the jitted step re-run on ONE prepared batch at
                        the SAME occupancy (no loader, plans prebuilt):
                        proves/refutes "warm epochs are device-bound"
  * host read / plan-build ms per batch.

Run: python bench_e2e.py   (writes BENCH_e2e.json in the repo root)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FILE = "/tmp/dune3d_e2e_36k.h5"
BATCH = 8
N_EVENTS = 128


def main():
    import numpy as np

    from sparseeventid_tpu.config import load_config
    from sparseeventid_tpu.io.larcv import write_synthetic_larcv_file

    if not os.path.exists(FILE):
        # 75 tracks x 900 steps dedups to ~36k unique voxels/event — the
        # FULL dune3d occupancy the r3 e2e run measured (PERF_NOTES), which
        # is the regime the VERDICT asked the device-only number at
        write_synthetic_larcv_file(
            FILE, n_events=N_EVENTS, image_size=(1024, 512, 1280), seed=77,
            mean_tracks=75.0, steps_per_track=900, max_voxels=50000,
        )

    cfg = load_config(
        "dune3d",
        [
            f"data.train={FILE}",
            "data.active=[train]",
            f"run.minibatch_size={BATCH}",
            "run.precision=bfloat16",
            "run.distributed=false",
            "framework.remat=false",
            "run.id=bench_e2e",
            "output_dir=/tmp/bench_e2e_out",
        ],
    )
    from sparseeventid_tpu.train.trainer import Trainer

    t = Trainer(cfg)

    # --- host-side costs, device out of the loop ---
    ds = t.datasets["train"]
    idx = np.arange(BATCH)
    for _ in range(2):
        batch = ds.batch(idx)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        batch = ds.batch(idx)
    read_ms = (time.perf_counter() - t0) / reps * 1e3

    t._compute_host_plans(batch["image"])  # warm (also fills one cache row)
    t0 = time.perf_counter()
    for _ in range(reps):
        t._compute_host_plans(batch["image"])
    plan_ms = (time.perf_counter() - t0) / reps * 1e3
    occ = int(np.mean(np.sum(batch["image"][:, :, 0] > -999, axis=1)))
    print(
        f"occupancy ~{occ} vox/event; read {read_ms:.1f} ms/batch; "
        f"plan build {plan_ms:.1f} ms/batch",
        flush=True,
    )

    # --- full trainer loop through BatchLoader prefetch ---
    import jax

    state, train_step, eval_step, n_steps, prepare = t._build_training()
    # fresh cache so epoch 1 is genuinely cold (the probes above warmed
    # one entry)
    if t._plan_cache is not None:
        t._plan_cache.clear()
    loader = t._loader("train")
    rng = jax.random.PRNGKey(7)

    def one_step(state):
        args = prepare(next(loader))
        state, metrics = train_step(state, *args, rng)
        return state, metrics

    # compile (first step) outside all timings
    state, metrics = one_step(state)
    _ = float(metrics["loss/loss"])

    steps_per_epoch = N_EVENTS // BATCH  # 16

    def timed_epoch(state):
        t0 = time.perf_counter()
        for _ in range(steps_per_epoch):
            state, metrics = one_step(state)
        _ = float(metrics["loss/loss"])  # axon: force host transfer
        dt = time.perf_counter() - t0
        return state, N_EVENTS / dt, metrics

    # epoch 1 (cold cache; one batch already seen during compile)
    state, cold_rate, metrics = timed_epoch(state)
    # epochs 2-4 (warm cache)
    warm = []
    for _ in range(3):
        state, r_, metrics = timed_epoch(state)
        warm.append(r_)
    warm_rate = float(np.median(warm))
    dropped = int(np.asarray(metrics.get("overflow/dropped", 0)))

    # --- device-only at the SAME occupancy: fixed prepared batch ---
    args = prepare(next(loader))
    for _ in range(6):
        state, metrics = train_step(state, *args, rng)
    _ = float(metrics["loss/loss"])
    dev = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            state, metrics = train_step(state, *args, rng)
        _ = float(metrics["loss/loss"])
        dev.append(BATCH / ((time.perf_counter() - t0) / 10))
    device_rate = float(np.median(dev))
    t._shutdown()

    out = {
        "metric": "dune3d_e2e_train_events_per_sec_per_chip",
        "value": round(warm_rate, 2),
        "unit": "events/s",
        "cold_epoch_ev_s": round(cold_rate, 2),
        "warm_epoch_ev_s": round(warm_rate, 2),
        "warm_epoch_blocks": [round(r_, 2) for r_ in warm],
        "device_only_ev_s": round(device_rate, 2),
        "device_only_blocks": [round(r_, 2) for r_ in dev],
        "occupancy_vox_per_event": occ,
        "host_read_ms_per_batch": round(read_ms, 1),
        "host_plan_ms_per_batch": round(plan_ms, 1),
        "overflow_dropped": dropped,
        "batch": BATCH,
        "n_events": N_EVENTS,
        "end_to_end": True,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_e2e.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
