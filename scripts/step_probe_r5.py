#!/usr/bin/env python
"""Round-5 step-variant probe: bound the XLA-glue cost of batch norm and
of the loss/optimizer tail by measuring the full train step against
ablated variants at the bench geometry (batch 8, ~19k active, host
plans, R=144, qbound 0.5).  Norm=none changes semantics — this is a
COST BOUND for deciding whether stats-in-kernel fusion is worth kernel
surgery, not a production config."""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import dataclasses

os.environ.setdefault("SEID_WINDOW_R", "144")
os.environ.setdefault("SEID_WINDOW_R_INITIAL", "144")

import jax
import jax.numpy as jnp
import numpy as np

from sparseeventid_tpu.config import load_config
from sparseeventid_tpu.config.schema import LossBalanceScheme
from sparseeventid_tpu.io.hostio import build_window_plans
from sparseeventid_tpu.models import build_sparse_classifier
from sparseeventid_tpu.models.encoder import capacity_schedule
from sparseeventid_tpu.ops import engine as _eng
from sparseeventid_tpu.ops.host_plans import encoder_plans_from_host
from sparseeventid_tpu.ops.pallas.window_conv import (
    window_r_default, window_r_for_level, window_r_initial,
    window_r_strided,
)
from sparseeventid_tpu.train import (
    build_lr_schedule,
    build_optimizer,
    create_train_state,
    make_train_step,
)

sys.path.insert(0, str(Path(__file__).resolve().parent))
from step_split import GRID, MAX_VOXELS, make_batch, timeit  # noqa


def build(norm: str):
    cfg = load_config(
        "dune3d",
        ["run.minibatch_size=8", "run.precision=bfloat16",
         "framework.remat=false",
         f"encoder.normalization={norm}",
         "encoder.query_bound_frac=0.5",
         "encoder.query_bound_growth=1.6"],
    )
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, max_voxels=MAX_VOXELS)
    )
    return cfg


def main():
    st, labels, coords_np = make_batch()
    caps = capacity_schedule(MAX_VOXELS, 5, 0.5, 1024)
    host = build_window_plans(
        coords_np, GRID, list(caps), initial_kernel=(5, 5, 5),
        series_kernel=(3, 3, 3), stride=(2, 2, 2),
        window_r=window_r_default(),
        ov_caps=[_eng._overflow_cap(c, 27) for c in caps],
        ov_cap_initial=_eng._overflow_cap(caps[0], 125),
        ov_caps_down=[_eng._overflow_cap(c, 8) for c in caps[:-1]],
        window_r_down=window_r_strided(),
        window_r_initial=window_r_initial(),
        window_r_series=[window_r_for_level(l) for l in range(len(caps))],
    )
    host0 = {k: jnp.asarray(v) for k, v in host.items()}

    def pb(s, h):
        return encoder_plans_from_host(
            s, h, 5, (5, 5, 5), (3, 3, 3), (2, 2, 2),
            q_bound_frac=0.5, q_bound_growth=1.6,
        )

    plans0 = jax.jit(pb)(st, host0)

    for norm in ("batch", "none"):
        cfg = build(norm)
        model = build_sparse_classifier(cfg)
        lr = build_lr_schedule(cfg.mode.optimizer.lr_schedule, 100, 25)
        optimizer = build_optimizer(cfg.mode.optimizer, lr)
        state = create_train_state(
            model, optimizer, jax.random.PRNGKey(0), st, plans0
        )
        step = jax.jit(make_train_step(
            model, optimizer, LossBalanceScheme.focal, lr, plans_builder=pb
        ))

        def run(s2, st2, l2, h2):
            ns, m = step(s2, st2, l2, h2, jax.random.PRNGKey(1))
            return m["loss/loss"]

        # warm thoroughly (warmup-drift trap, PERF_NOTES r2)
        for _ in range(2):
            t = timeit(run, state, st, labels, host0)
        t = timeit(run, state, st, labels, host0, iters=16)
        print(f"train step [norm={norm}]: {t:.1f} ms", flush=True)

        # eval fwd only (no grads/optimizer): bounds the backward+update
        ev = jax.jit(lambda v, s, h: jnp.sum(
            model.apply(v, s, False, pb(s, h))["labelneutID"].astype(
                jnp.float32)))
        for _ in range(2):
            tf = timeit(ev, state.variables(), st, host0)
        tf = timeit(ev, state.variables(), st, host0, iters=16)
        print(f"  fwd-only (eval) [norm={norm}]: {tf:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
