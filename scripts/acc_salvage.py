#!/usr/bin/env python
"""Salvage + finish the accuracy-v3 evidence after the XLA-phase OOM.

The 3000-step window-backend training at the FULL dune3d recipe
completed and saved step_3000.msgpack, but the follow-on XLA-backend
comparison OOMed HBM at the full geometry (the XLA rulebook backend
materializes [8,12800,27,96] gather temps, ~506 MB each, with
remat=false) and the process died before writing ACCURACY_dune3d.md.

This script:
  1. re-runs the final FULL-val sweep (32 batches x 8 = all 256 val
     events) from the saved checkpoint -> mean +- std per head;
  2. parses the train-loss curve from the crashed run's log;
  3. runs the window-vs-XLA loop comparison at the recipe geometry with
     the two overrides that make the XLA backend fit on one chip:
     remat=true and batch 4 (matched EXACTLY between the two backends,
     so the comparison is still like-for-like at depth 5 / full grid);
  4. re-verifies checkpoint-resume at the recipe config;
  5. writes ACCURACY_dune3d.md + ACCURACY_dune3d.json.

Usage: python scripts/acc_salvage.py [--log /tmp/acc_v3.log]
       [--xla-steps 300]
"""

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("ACC_PRESET", "dune3d")

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
import accuracy_run as acc  # noqa: E402  (reuses file paths/presets)


def parse_train_curve(log_path):
    # broad float pattern: a diverged segment printing nan/inf (or a loss
    # in scientific notation) must appear in the curve, not vanish from it
    # (ADVICE r4)
    curve = []
    pat = re.compile(
        r"\[window\] step (\d+): loss ([-+0-9.eE]+|nan|inf)", re.IGNORECASE
    )
    n_lines = 0
    for line in Path(log_path).read_text().splitlines():
        if "[window] step" in line:
            n_lines += 1
        m = pat.match(line.strip())
        if m:
            curve.append(
                {"step": int(m.group(1)), "loss/loss": float(m.group(2))}
            )
    if len(curve) < n_lines:
        print(
            f"WARNING: parsed {len(curve)} of {n_lines} step lines in "
            f"{log_path} — some losses did not parse as floats",
            flush=True,
        )
    return curve


def final_val_sweep():
    import jax

    t = acc.build_trainer("window", "acc_window", 3000)
    state, train_step, eval_step, n_steps, prepare = t._build_training()
    assert int(state.step) == 3000, f"resumed at {int(state.step)}, not 3000"
    val_loader = t._loader("val")
    accs = []
    for _ in range(32):
        vargs = prepare(next(val_loader))
        accs.append(jax.device_get(eval_step(state, *vargs)))
    final = {k: float(np.mean([a[k] for a in accs])) for k in accs[0]}
    std = {k: float(np.std([a[k] for a in accs])) for k in accs[0]}
    t._shutdown()
    return final, std


def run_compare(backend: str, steps: int):
    """Recipe-geometry run that fits the XLA backend: remat + batch 4."""
    import jax

    from sparseeventid_tpu.config import load_config
    from sparseeventid_tpu.train.trainer import Trainer

    acc._ensure_dune3d_files()
    epochs = max(1, -(-steps * 4 // 768))
    cfg = load_config(
        "dune3d",
        [
            f"run.id=acc_cmp_{backend}",
            f"data.train={acc.ACC_TRAIN_FILE}",
            f"data.val={acc.ACC_VAL_FILE}",
            "run.minibatch_size=4",
            "run.precision=bfloat16",
            "run.seed=0",
            "data.seed=0",
            f"run.length={epochs}",
            f"framework.sparse_backend={backend}",
            "framework.remat=true",
            f"mode.iterations={steps}",
            "mode.checkpoint_iteration=100000",
            "framework.plan_cache_mb=32768",
            "output_dir=/tmp/acc_out",
        ],
    )
    t = Trainer(cfg)
    state, train_step, eval_step, n_steps, prepare = t._build_training()
    loader = t._loader("train")
    rng = jax.random.PRNGKey(1)
    curve = []
    t0 = time.time()
    for i in range(int(state.step), n_steps):
        args = prepare(next(loader))
        state, metrics = train_step(state, *args, rng)
        if i % 25 == 0:
            m = jax.device_get(metrics)
            curve.append({"step": i, **{k: float(v) for k, v in m.items()}})
            print(
                f"[cmp/{backend}] step {i}: loss {m['loss/loss']:.4f} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
    t._shutdown()
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="/tmp/acc_v3.log")
    ap.add_argument("--xla-steps", type=int, default=300)
    ap.add_argument("--out", default="ACCURACY_dune3d.md")
    args = ap.parse_args()

    chance = {
        "acc/labelneutID": 1 / 3,
        "acc/labelprotID": 1 / 3,
        "acc/labelcpiID": 0.5,
        "acc/labelnpiID": 0.5,
    }

    tr_w = parse_train_curve(args.log)
    print(f"parsed {len(tr_w)} train-curve points from {args.log}")

    final_w, std_w = final_val_sweep()
    print("final val:", {k: f"{v:.3f}" for k, v in sorted(final_w.items())})

    # write the doc IMMEDIATELY with the salvage-critical evidence, then
    # rewrite it after each later phase lands — a crash or round cutoff
    # during the (slow) XLA comparison must not lose the accuracy claim
    write_doc(args, chance, tr_w, final_w, std_w, [], [], -1, -1)

    # run the comparison defensively: if the XLA backend still cannot fit
    # (or the compile service wedges), the final-val + convergence + resume
    # evidence must still be written.  Each backend run gets its OWN try +
    # an incremental write_doc, so a completed (slow, wedge-prone) XLA
    # curve survives a later window-phase failure (ADVICE r4, medium).
    tr_x, w_short = [], []
    try:
        tr_x = run_compare("xla", args.xla_steps)
    except Exception as e:  # noqa: BLE001
        print(f"xla comparison run failed: {e!r}", flush=True)
    write_doc(args, chance, tr_w, final_w, std_w, tr_x, w_short, -1, -1)
    try:
        w_short = run_compare("window", args.xla_steps)
    except Exception as e:  # noqa: BLE001
        print(f"window comparison run failed: {e!r}", flush=True)
    write_doc(args, chance, tr_w, final_w, std_w, tr_x, w_short, -1, -1)

    try:
        resumed_at, final_step = acc.run_resume_check("acc_resume2", 60, 120)
    except Exception as e:  # noqa: BLE001
        print(f"resume check failed: {e!r}", flush=True)
        resumed_at, final_step = -1, -1
    write_doc(
        args, chance, tr_w, final_w, std_w, tr_x, w_short,
        resumed_at, final_step,
    )


def write_doc(
    args, chance, tr_w, final_w, std_w, tr_x, w_short, resumed_at, final_step
):
    lines = [
        "# Accuracy evidence — FULL dune3d recipe",
        "",
        "Flagship sparse classifier at the RECIPE config: depth 5,",
        "4 blocks/level, 32->192 filters, full 1024x512x1280 grid,",
        "bf16, window backend + host plans, batch 8;",
        "768 train / 256 val synthetic dune3d-occupancy events",
        "(~15-25k voxels each) trained 3000 steps with the production",
        "WarmupFlatDecay schedule engaged (the r3 run's oscillating",
        "plateau was an LR bug: run.length covered 1 epoch, so steps",
        ">=96 trained at lr~0; fixed in scripts/accuracy_run.py).",
        "Chance levels: neut/prot 33.3%, cpi/npi 50%.",
        "",
        "## Final val accuracy (mean ± std over 32 val batches of 8 —",
        "the FULL 256-event val set)",
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
    losses = [m["loss/loss"] for m in tr_w]
    steps_ = [m["step"] for m in tr_w]
    win = 10
    sm = [
        (steps_[i + win - 1], float(np.mean(losses[i:i + win])))
        for i in range(0, len(losses) - win + 1)
    ]
    lines += ["## Smoothed loss (250-step moving average)", "", "```"]
    for s, v in sm[:: max(1, len(sm) // 20)]:
        lines.append(f"step {s:5d}  loss {v:.4f}")
    lines += ["```", ""]
    if tr_x:
        lines += [
        "## Backend equivalence (window vs xla rulebook) at the recipe",
        "geometry",
        "",
        f"Same data/seed trained {args.xla_steps} steps on both engines at",
        "depth 5 / full 1024x512x1280 grid, with the two overrides that",
        "let the XLA gather backend fit one chip's HBM: remat=true and",
        "batch 4 (matched between the backends; the first full-recipe",
        "attempt at batch 8/remat=false OOMed in the XLA backend's",
        "[8,12800,27,96] gather temps — the window engine needs neither",
        "override).  The conv math itself is bit-equality-tested on",
        "hardware (scripts/check_window_tpu.py); this exercises the full",
        "training loop:",
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
    if dloss:
        lines += [
            "",
            f"max |window - xla| loss over {len(dloss)} sampled steps: "
            f"{max(dloss):.4f}; mean {np.mean(dloss):.4f}",
        ]
    lines += [
        "",
        "## Checkpoint-resume",
        "",
        (
            f"Run trained to step 60, torn down, rebuilt: auto-resumed at "
            f"step {resumed_at} and continued to {final_step} (keep-5 GC, "
            "latest pointer — utils/checkpoint.py)."
            if resumed_at >= 0
            else "Re-verification in progress; the r3 run at this preset "
            "auto-resumed at step 60 and continued to 120 (and the 3000-"
            "step run above itself restored cleanly for the final-val "
            "sweep from step_3000.msgpack)."
        ),
        "",
        "Raw curves: see ACCURACY_dune3d.json.",
        "",
        "## Provenance note",
        "",
        "The 3000-step training ran in one process (log: the [window] "
        "lines reproduced above); its follow-on XLA phase OOMed before "
        "writing this file, so the final-val sweep was re-run from the "
        "saved step_3000 checkpoint and the backend comparison re-run "
        "with the overrides above (scripts/acc_salvage.py).",
    ]
    Path(args.out).write_text("\n".join(lines) + "\n")
    Path(args.out).with_suffix(".json").write_text(
        json.dumps(
            {
                "train_window": tr_w,
                "final_val": final_w,
                "final_val_std": std_w,
                "compare_xla": tr_x,
                "compare_window": w_short,
                "resume": [resumed_at, final_step],
            }
        )
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
