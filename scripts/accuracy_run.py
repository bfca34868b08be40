#!/usr/bin/env python
"""Accuracy evidence run (VERDICT r1 next-round #4).

Trains the flagship sparse classifier on a synthetic dataset large enough
to generalize, with the production window backend, and records:
  * per-head val accuracy + loss curves (ACCURACY.md)
  * a checkpoint-resume mid-run (restart equivalence)
  * a window-vs-xla backend comparison over the same steps (the two
    engines must produce statistically identical training, since the conv
    math is equality-tested; this checks the full training loop)

Usage: python scripts/accuracy_run.py [--steps 1500] [--out ACCURACY.md]
"""

import argparse
import dataclasses
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


PRESET = os.environ.get("ACC_PRESET", "small")

ACC_TRAIN_FILE = "/tmp/acc_dune3d_v3_train.h5"
ACC_VAL_FILE = "/tmp/acc_dune3d_v3_val.h5"


def _ensure_dune3d_files():
    """Full-grid dune3d-occupancy larcv files (generated once; reading
    them back through the production loader is ~100x faster than
    regenerating events per epoch on this 1-core host)."""
    from sparseeventid_tpu.io.larcv import write_synthetic_larcv_file

    for path, n, seed in ((ACC_TRAIN_FILE, 768, 101), (ACC_VAL_FILE, 256, 202)):
        if not os.path.exists(path):
            print(f"generating {path} ({n} events)...", flush=True)
            write_synthetic_larcv_file(
                path, n_events=n, image_size=(1024, 512, 1280), seed=seed,
                mean_tracks=40.0, steps_per_track=900, max_voxels=50000,
            )


def build_trainer(backend: str, run_id: str, steps: int, resume: bool = False):
    import jax

    from sparseeventid_tpu.config import load_config
    from sparseeventid_tpu.train.trainer import Trainer

    if PRESET == "dune3d":
        # VERDICT r2 #5: the RECIPE config — depth 5, 4 blocks/level,
        # full 1024x512x1280 grid, bf16, window backend + host plans.
        # (The xla-backend comparison stays at the small preset: at this
        # scale the device-plan XLA path compiles ~100 s/shape and runs
        # ~10x slower — kernel-level equality at dune3d geometry is
        # already bit-exact on hardware, scripts/check_window_tpu.py.)
        _ensure_dune3d_files()
        # run.length must cover mode.iterations: the LR schedule is built
        # from (epoch_length, run.length) and collapses to lr~0 past its
        # end — the r3 run left run.length at the default 1 epoch (96
        # steps), so steps 96-3000 trained at lr~0 and never converged
        # (ACCURACY_dune3d.md v1's oscillating plateau).
        epochs = max(1, -(-steps * 8 // 768))  # ceil(steps/epoch_length)
        cfg = load_config(
            "dune3d",
            [
                f"run.id={run_id}",
                f"data.train={ACC_TRAIN_FILE}",
                f"data.val={ACC_VAL_FILE}",
                "run.minibatch_size=8",
                "run.precision=bfloat16",
                "run.seed=0",
                "data.seed=0",
                f"run.length={epochs}",
                f"framework.sparse_backend={backend}",
                "framework.remat=false",
                f"mode.iterations={steps}",
                "mode.checkpoint_iteration=500",
                # hold every train+val event's plan across epochs (host
                # has 125 GB; the default 8 GB could thrash at 1024 events)
                "framework.plan_cache_mb=32768",
                "output_dir=/tmp/acc_out",
            ],
        )
        return Trainer(cfg)
    cfg = load_config(
        "synthetic",
        [
            f"run.id={run_id}",
            "run.minibatch_size=8",
            "run.precision=bfloat16",
            "run.seed=0",
            "data.seed=0",
            f"run.length={max(1, -(-steps * 8 // 2048))}",  # cover iterations
            "data.max_voxels=6144",
            "data.synthetic_events=2048",
            "encoder.depth=3",
            "encoder.blocks_per_layer=2",
            "encoder.n_initial_filters=16",
            "encoder.n_output_filters=64",
            "framework.min_capacity=512",
            f"framework.sparse_backend={backend}",
            "framework.remat=false",
            f"mode.iterations={steps}",
            "mode.checkpoint_iteration=100",
        ],
    )
    return Trainer(cfg)


def run_training(backend: str, run_id: str, steps: int):
    """Train and return (train_curve, val_curve) metric dicts by step."""
    import jax

    t = build_trainer(backend, run_id, steps)
    state, train_step, eval_step, n_steps, prepare = t._build_training()
    loader = t._loader("train")
    val_loader = t._loader("val")
    rng = jax.random.PRNGKey(1)
    train_curve, val_curve = [], []
    t0 = time.time()
    val_every = 50 if PRESET == "dune3d" else 25
    for i in range(int(state.step), n_steps):
        if i % val_every == 0:
            # 4-batch (32-event) val points: the r3 single-batch points
            # swung 37->100% on 8-event slices (VERDICT r3 weak #2)
            vms = [
                jax.device_get(eval_step(state, *prepare(next(val_loader))))
                for _ in range(4)
            ]
            vm = {k: float(np.mean([m[k] for m in vms])) for k in vms[0]}
            val_curve.append({"step": i, **vm})
        args = prepare(next(loader))
        state, metrics = train_step(state, *args, rng)
        if i % 25 == 0:
            m = jax.device_get(metrics)
            train_curve.append(
                {"step": i, **{k: float(v) for k, v in m.items()}}
            )
            print(
                f"[{backend}] step {i}: loss {m['loss/loss']:.4f} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
        if i + 1 == n_steps and jax.process_index() == 0:
            t.ckpt.save(state, int(state.step))
    # final val sweep over the FULL val set (32 batches x 8 = 256 events at
    # the dune3d preset; mean +- std across batches = the error bar on each
    # head's accuracy, VERDICT r3 task #4)
    accs = []
    for _ in range(32 if PRESET == "dune3d" else 16):
        vargs = prepare(next(val_loader))
        accs.append(jax.device_get(eval_step(state, *vargs)))
    final = {
        k: float(np.mean([a[k] for a in accs])) for k in accs[0]
    }
    final_std = {
        k: float(np.std([a[k] for a in accs])) for k in accs[0]
    }
    t._shutdown()
    return train_curve, val_curve, final, final_std


def run_resume_check(run_id: str, steps_a: int, steps_b: int):
    """Train steps_a, tear down, rebuild trainer (auto-resume), train to
    steps_b; return the resumed start step to prove checkpoint-restart."""
    import jax

    t = build_trainer("window", run_id, steps_a)
    state, train_step, eval_step, n_steps, prepare = t._build_training()
    loader = t._loader("train")
    rng = jax.random.PRNGKey(1)
    for i in range(n_steps):
        args = prepare(next(loader))
        state, _ = train_step(state, *args, rng)
    t.ckpt.save(state, int(state.step))
    loss_a = None
    t._shutdown()

    t2 = build_trainer("window", run_id, steps_b)
    state2, train_step2, _, n2, prepare2 = t2._build_training()
    resumed_at = int(state2.step)
    loader2 = t2._loader("train")
    for i in range(resumed_at, n2):
        args = prepare2(next(loader2))
        state2, m = train_step2(state2, *args, rng)
    final_step = int(state2.step)
    t2._shutdown()
    return resumed_at, final_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--xla-steps", type=int, default=300)
    ap.add_argument("--out", default="ACCURACY.md")
    args = ap.parse_args()

    chance = {
        "acc/labelneutID": 1 / 3,
        "acc/labelprotID": 1 / 3,
        "acc/labelcpiID": 0.5,
        "acc/labelnpiID": 0.5,
    }

    tr_w, val_w, final_w, std_w = run_training(
        "window", "acc_window", args.steps
    )
    if PRESET == "dune3d":
        # full-recipe xla comparison (VERDICT r3 task #4: >=300 steps at
        # the recipe config; ~10x slower than window + ~100 s/shape
        # compiles, so gated behind ACC_XLA_FULL)
        if os.environ.get("ACC_XLA_FULL") == "1":
            tr_x, val_x, final_x, _ = run_training(
                "xla", "acc_xla_full", args.xla_steps
            )
            # matched-schedule window run at the SAME horizon (run.length
            # is derived from steps, so slicing the long run would compare
            # different LR schedules)
            w_short, _, _, _ = run_training(
                "window", "acc_window_short", args.xla_steps
            )
        else:
            tr_x, val_x, final_x = [], [], {}
            w_short = []
        resumed_at, final_step = run_resume_check("acc_resume", 60, 120)
    else:
        tr_x, val_x, final_x, _ = run_training(
            "xla", "acc_xla", args.xla_steps
        )
        # matched-schedule window run at the xla horizon (run.length is
        # derived from steps; slicing the long run would compare different
        # LR schedules)
        w_short, _, _, _ = run_training(
            "window", "acc_window_short", args.xla_steps
        )
        resumed_at, final_step = run_resume_check("acc_resume", 120, 240)

    header = (
        [
            "# Accuracy evidence — FULL dune3d recipe",
            "",
            "Flagship sparse classifier at the RECIPE config: depth 5,",
            "4 blocks/level, 32->192 filters, full 1024x512x1280 grid,",
            "bf16, window backend + host plans, batch 8;",
            "768 train / 256 val synthetic dune3d-occupancy events",
            f"(~15-25k voxels each) trained {args.steps} steps.",
            "Chance levels: neut/prot 33.3%, cpi/npi 50%.",
            "",
            "Window-vs-XLA at this scale: the conv kernels are bit-exact",
            "on hardware at exactly this geometry (check_window_tpu.py,",
            "PERF_NOTES r3); the loop-level window==xla comparison lives",
            "in the small preset (ACCURACY.md).",
        ]
        if PRESET == "dune3d"
        else [
            "# Accuracy evidence (synthetic dune3d-shaped run)",
            "",
            "Flagship sparse classifier (window backend, bf16, batch 8, depth 3,",
            "2048 train / 256 val synthetic events, grid from the synthetic",
            f"recipe) trained {args.steps} steps. Chance levels: neut/prot 33.3%,",
            "cpi/npi 50%.",
        ]
    )
    lines = header + [
        "",
        "## Final val accuracy (mean ± std over "
        f"{32 if PRESET == 'dune3d' else 16} val batches of 8)",
        "",
        "| head | accuracy | chance |",
        "|---|---|---|",
    ]
    for k in sorted(chance):
        lines.append(
            f"| {k} | {final_w[k]*100:.1f}% ± {std_w[k]*100:.1f}% "
            f"| {chance[k]*100:.1f}% |"
        )
    lines += [
        f"| loss | {final_w['loss/loss']:.4f} ± {std_w['loss/loss']:.4f}"
        " | — |",
        "",
        "## Loss curve (train, every 25 steps)",
        "",
        "```",
    ]
    for m in tr_w[:: max(1, len(tr_w) // 20)]:
        lines.append(f"step {m['step']:5d}  loss {m['loss/loss']:.4f}")
    lines += ["```", ""]
    if len(tr_w) >= 20:
        # smoothed curve: the per-step loss is batch-8 focal loss and
        # inherently noisy; a 10-sample (250-step) moving average shows
        # whether training actually converges.
        losses = [m["loss/loss"] for m in tr_w]
        steps_ = [m["step"] for m in tr_w]
        win = 10
        sm = [
            (steps_[i + win - 1], float(np.mean(losses[i:i + win])))
            for i in range(0, len(losses) - win + 1)
        ]
        lines += [
            "## Smoothed loss (250-step moving average)",
            "",
            "```",
        ]
        for s, v in sm[:: max(1, len(sm) // 20)]:
            lines.append(f"step {s:5d}  loss {v:.4f}")
        lines += ["```", ""]
    if tr_x:
        lines += [
            "## Backend equivalence (window vs xla rulebook)",
            "",
            f"Same data/seed trained {args.xla_steps} steps on both engines",
            "(the conv math is bit-equality-tested in",
            "scripts/check_window_tpu.py; this exercises the full loop):",
            "",
            "| step | window loss | xla loss |",
            "|---|---|---|",
        ]
        for mw, mx in zip(w_short, tr_x):
            lines.append(
                f"| {mw['step']} | {mw['loss/loss']:.4f} | {mx['loss/loss']:.4f} |"
            )
        dloss = [
            abs(mw["loss/loss"] - mx["loss/loss"])
            for mw, mx in zip(w_short, tr_x)
        ]
        lines += [
            "",
            f"max |window - xla| loss over the horizon: {max(dloss):.4f}",
        ]
    lines += [
        "",
        "## Checkpoint-resume",
        "",
        f"Run trained partway, torn down, rebuilt: auto-resumed at step "
        f"{resumed_at} and continued to {final_step} (keep-5 GC, latest "
        "pointer — utils/checkpoint.py).",
        "",
        f"Raw curves: see {Path(args.out).with_suffix('.json').name}.",
    ]
    if PRESET == "dune3d" and val_w:
        lines += ["", "## Val accuracy curve (every 25 steps)", "", "```"]
        for m in val_w[:: max(1, len(val_w) // 24)]:
            accs = " ".join(
                f"{k.split('label')[-1]} {m[k]*100:5.1f}%"
                for k in sorted(m) if k.startswith("acc/")
            )
            lines.append(f"step {m['step']:5d}  loss {m['loss/loss']:.4f}  {accs}")
        lines.append("```")
    Path(args.out).write_text("\n".join(lines) + "\n")
    # raw curves live next to the markdown they back (ACCURACY.json for
    # the small preset, ACCURACY_dune3d.json for the recipe preset)
    json_path = Path(args.out).with_suffix(".json")
    Path(json_path).write_text(
        json.dumps(
            dict(
                window_train=tr_w, window_val=val_w, window_final=final_w,
                xla_train=tr_x, xla_final=final_x,
                resume=dict(resumed_at=resumed_at, final_step=final_step),
            )
        )
    )
    print("wrote", args.out)


if __name__ == "__main__":
    main()
