#!/usr/bin/env python
"""Extend the accuracy-v3 dune3d run to 6000 steps (VERDICT r4 task #3).

Resumes the saved acc_window run (auto-resume from step_3000.msgpack),
trains to --steps with the same recipe/schedule (run.length re-derived so
the WarmupFlatDecay decay floor is actually reached), merges the new
train curve with the committed ACCURACY_dune3d.json, re-runs the full
256-event val sweep, and rewrites ACCURACY_dune3d.md/.json in place.

Each phase writes incrementally (the compile service can wedge — memory
note + ADVICE r4): the curve JSON is updated every 500 steps.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("ACC_PRESET", "dune3d")

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
import accuracy_run as acc  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--out", default="ACCURACY_dune3d.md")
    ap.add_argument("--json-in", default="ACCURACY_dune3d.json")
    args = ap.parse_args()

    import jax

    prev = json.loads(Path(args.json_in).read_text())
    curve = [m for m in prev["train_window"] if m["step"] < 3000]

    t = acc.build_trainer("window", "acc_window", args.steps)
    state, train_step, eval_step, n_steps, prepare = t._build_training()
    start = int(state.step)
    print(f"resumed at step {start}, extending to {n_steps}", flush=True)
    assert start >= 3000, f"expected resume from >=3000, got {start}"
    loader = t._loader("train")
    rng = jax.random.PRNGKey(1)
    t0 = time.time()

    def flush_json(resume_pair=None):
        doc = dict(prev)
        doc["train_window"] = curve
        if resume_pair is not None:
            doc["resume"] = resume_pair
        Path(args.json_in).write_text(json.dumps(doc))

    for i in range(start, n_steps):
        batch = prepare(next(loader))
        state, metrics = train_step(state, *batch, rng)
        if i % 25 == 0:
            m = jax.device_get(metrics)
            curve.append(
                {"step": i, "loss/loss": round(float(m["loss/loss"]), 4)}
            )
            print(
                f"[window] step {i}: loss {m['loss/loss']:.4f} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
        if i % 500 == 0 and i > start:
            t.ckpt.save(state, int(state.step))
            flush_json()
    t.ckpt.save(state, int(state.step))
    flush_json()

    # full val sweep: all 256 val events, mean +- std across 32 batches
    val_loader = t._loader("val")
    accs = []
    for _ in range(32):
        vargs = prepare(next(val_loader))
        accs.append(jax.device_get(eval_step(state, *vargs)))
    final = {k: float(np.mean([a[k] for a in accs])) for k in accs[0]}
    std = {k: float(np.std([a[k] for a in accs])) for k in accs[0]}
    t._shutdown()

    prev["train_window"] = curve
    prev["final_val"] = final
    prev["final_val_std"] = std
    Path(args.json_in).write_text(json.dumps(prev))

    write_md(args, prev, n_steps)
    print("wrote", args.out)


def write_md(args, doc, n_steps):
    chance = {
        "acc/labelneutID": 1 / 3,
        "acc/labelprotID": 1 / 3,
        "acc/labelcpiID": 0.5,
        "acc/labelnpiID": 0.5,
    }
    final_w, std_w = doc["final_val"], doc["final_val_std"]
    tr_w = doc["train_window"]
    lines = [
        "# Accuracy evidence — FULL dune3d recipe",
        "",
        "Flagship sparse classifier at the RECIPE config: depth 5,",
        "4 blocks/level, 32->192 filters, full 1024x512x1280 grid,",
        "bf16, window backend + host plans, batch 8;",
        "768 train / 256 val synthetic dune3d-occupancy events",
        f"(~15-25k voxels each) trained {n_steps} steps with the",
        "production WarmupFlatDecay schedule engaged (first 3000 steps:",
        "the committed r4 run; extended to the decay floor in round 5 —",
        "scripts/acc_extend.py resumed from step_3000.msgpack).",
        "Chance levels: neut/prot 33.3%, cpi/npi 50%.",
        "",
        "## Final val accuracy (mean ± std over 32 val batches of 8 —",
        "the FULL 256-event val set)",
        "",
        "| head | accuracy | chance |",
        "|---|---|---|",
    ]
    for k in sorted(chance):
        sigma = (final_w[k] - chance[k]) / max(std_w[k], 1e-9)
        claim = f"{sigma:+.1f}σ vs chance"
        lines.append(
            f"| {k} | {final_w[k]*100:.1f}% ± {std_w[k]*100:.1f}% "
            f"| {chance[k]*100:.1f}% ({claim}) |"
        )
    lines += [
        f"| loss | {final_w['loss/loss']:.4f} ± {std_w['loss/loss']:.4f}"
        " | — |",
        "",
        "## Loss curve (train, every 25 steps)",
        "",
        "```",
    ]
    for m in tr_w[:: max(1, len(tr_w) // 24)]:
        lines.append(f"step {m['step']:5d}  loss {m['loss/loss']:.4f}")
    lines += ["```", ""]
    losses = [m["loss/loss"] for m in tr_w]
    steps_ = [m["step"] for m in tr_w]
    win = 10
    sm = [
        (steps_[i + win - 1], float(np.mean(losses[i:i + win])))
        for i in range(0, len(losses) - win + 1)
    ]
    lines += ["## Smoothed loss (250-step moving average)", "", "```"]
    for s, v in sm[:: max(1, len(sm) // 24)]:
        lines.append(f"step {s:5d}  loss {v:.4f}")
    lines += ["```", ""]
    # tail-flatness: mean slope of the last 1000 smoothed steps
    tail = [(s, v) for s, v in sm if s >= steps_[-1] - 1000]
    if len(tail) >= 2:
        slope = (tail[-1][1] - tail[0][1]) / (tail[-1][0] - tail[0][0])
        lines += [
            f"Tail slope (last 1000 steps, smoothed): {slope*1000:+.4f} "
            "loss/1000 steps.",
            "",
        ]
    tr_x, w_short = doc.get("compare_xla", []), doc.get("compare_window", [])
    if tr_x:
        lines += [
            "## Backend equivalence (window vs xla rulebook) at the recipe",
            "geometry",
            "",
            "Same data/seed trained 300 steps on both engines at",
            "depth 5 / full 1024x512x1280 grid, with the two overrides that",
            "let the XLA gather backend fit one chip's HBM: remat=true and",
            "batch 4 (matched between the backends).  The conv math itself",
            "is bit-equality-tested on hardware (check_window_tpu.py); this",
            "exercises the full training loop:",
            "",
            "| step | window loss | xla loss |",
            "|---|---|---|",
        ]
        for mw, mx in zip(w_short, tr_x):
            lines.append(
                f"| {mw['step']} | {mw['loss/loss']:.4f} "
                f"| {mx['loss/loss']:.4f} |"
            )
        dloss = [
            abs(mw["loss/loss"] - mx["loss/loss"])
            for mw, mx in zip(w_short, tr_x)
        ]
        lines += [
            "",
            f"max |window - xla| loss over {len(dloss)} sampled steps: "
            f"{max(dloss):.4f}; mean {np.mean(dloss):.4f}",
        ]
    resume = doc.get("resume", [-1, -1])
    lines += [
        "",
        "## Checkpoint-resume",
        "",
        (
            f"Run trained to step 60, torn down, rebuilt: auto-resumed at "
            f"step {resume[0]} and continued to {resume[1]} (keep-5 GC, "
            "latest pointer — utils/checkpoint.py).  The 6000-step run "
            "itself resumed from step_3000.msgpack (this extension) and "
            "from its own 500-step checkpoints."
            if resume[0] >= 0
            else "See tests/test_train.py::test_checkpoint_resume."
        ),
        "",
        "Raw curves: see ACCURACY_dune3d.json.",
    ]
    Path(args.out).write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
