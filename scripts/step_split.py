#!/usr/bin/env python
"""Split the bench step into components: full train step vs fwd-only loss
vs encoder-only forward, at the bench config with host plans."""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sparseeventid_tpu import ops
from sparseeventid_tpu.config import load_config
from sparseeventid_tpu.config.schema import LossBalanceScheme, OUTPUT_SHAPE
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
from sparseeventid_tpu.train.losses import multi_head_loss

GRID = (1024, 512, 1280)
MAX_VOXELS = 50000
BATCH = 8


def make_batch():
    r = np.random.default_rng(0)
    coords = np.full((BATCH, MAX_VOXELS, 3), -1, np.int32)
    feats = np.zeros((BATCH, MAX_VOXELS, 1), np.float32)
    for b in range(BATCH):
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
        k = min(len(c), MAX_VOXELS)
        coords[b, :k] = c[:k]
        feats[b, :k, 0] = r.standard_normal(k)
    from sparseeventid_tpu.models.encoder import GRID_QUANTUM, _round_up
    st = ops.build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats), GRID,
                                 capacity=_round_up(MAX_VOXELS, GRID_QUANTUM))
    st = st.with_feats(st.feats.astype(jnp.bfloat16))
    labels = {
        k: jnp.asarray(r.integers(0, v, BATCH).astype(np.int32))
        for k, v in OUTPUT_SHAPE.items()
    }
    return st, labels, coords


def timeit(fn, *args, iters=8):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


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

    # encoder fwd only
    from sparseeventid_tpu.models.encoder import Encoder
    enc_fwd = jax.jit(
        lambda v, s, h: jnp.sum(
            model.apply(v, s, False, pb(s, h))["labelneutID"].astype(
                jnp.float32
            )
        )
    )
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), st, False, plans0
    )
    t_fwd = timeit(enc_fwd, variables, st, host0)
    print(f"model fwd (eval): {t_fwd:.1f} ms", flush=True)

    # full train step
    lr = build_lr_schedule(cfg.mode.optimizer.lr_schedule, 100, 25)
    optimizer = build_optimizer(cfg.mode.optimizer, lr)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), st,
                               plans0)
    step = jax.jit(make_train_step(model, optimizer, LossBalanceScheme.focal,
                                   lr, plans_builder=pb))

    def run_step(s2, st2, l2, h2):
        ns, m = step(s2, st2, l2, h2, jax.random.PRNGKey(1))
        return m["loss/loss"]

    t_step = timeit(run_step, state, st, labels, host0)
    print(f"full train step: {t_step:.1f} ms", flush=True)

    # qkeys/plan adaptation alone
    t_pb = timeit(jax.jit(lambda s, h: pb(s, h).initial.qmeta), st, host0)
    print(f"plans_from_host (qkeys etc): {t_pb:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
