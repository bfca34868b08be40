"""End-to-end training: loss decreases on synthetic data; checkpoint
round-trips; data-parallel shard_map step matches single-device math."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparseeventid_tpu.config import load_config
from sparseeventid_tpu.config.schema import (
    LossBalanceScheme,
    OUTPUT_SHAPE,
)
from sparseeventid_tpu.io import SyntheticDataset, SyntheticEventConfig
from sparseeventid_tpu.io.transforms import larcv_batch_to_sparse_3d
from sparseeventid_tpu.models import build_sparse_classifier
from sparseeventid_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from sparseeventid_tpu.train import (
    build_lr_schedule,
    build_optimizer,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from sparseeventid_tpu.utils import CheckpointManager


GRID = (16, 16, 16)
CAP = 256


def tiny_setup(batch=4):
    cfg = load_config(
        "synthetic",
        [
            "encoder.depth=2",
            "encoder.blocks_per_layer=1",
            "encoder.n_initial_filters=8",
            "encoder.n_output_filters=16",
            "framework.min_capacity=64",
            f"run.minibatch_size={batch}",
        ],
    )
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, max_voxels=CAP))
    model = build_sparse_classifier(cfg)
    ds = SyntheticDataset(
        32, SyntheticEventConfig(image_size=GRID, max_voxels=CAP), seed=1
    )
    return cfg, model, ds


def get_batch(ds, idx, b):
    batch = ds.batch([(idx * b + i) % len(ds) for i in range(b)])
    st = larcv_batch_to_sparse_3d(batch["image"], GRID)
    labels = {k: jnp.asarray(batch[k]) for k in OUTPUT_SHAPE}
    return st, labels


def test_loss_decreases():
    cfg, model, ds = tiny_setup()
    opt_cfg = cfg.mode.optimizer
    lr = build_lr_schedule(opt_cfg.lr_schedule, epoch_length=8, total_epochs=10)
    optimizer = build_optimizer(opt_cfg, lr)
    st0, labels0 = get_batch(ds, 0, 4)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), st0)
    step = jax.jit(
        make_train_step(model, optimizer, LossBalanceScheme.focal, lr)
    )
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(12):
        st, labels = get_batch(ds, i % 4, 4)
        state, metrics = step(state, st, labels, None, rng)
        losses.append(float(metrics["loss/loss"]))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(state.step) == 12
    assert np.isfinite(losses).all()


def test_eval_step_runs():
    cfg, model, ds = tiny_setup()
    opt_cfg = cfg.mode.optimizer
    lr = build_lr_schedule(opt_cfg.lr_schedule, 8, 10)
    optimizer = build_optimizer(opt_cfg, lr)
    st0, labels0 = get_batch(ds, 0, 4)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), st0)
    ev = jax.jit(make_eval_step(model, LossBalanceScheme.focal))
    metrics = ev(state, st0, labels0, None)
    assert np.isfinite(float(metrics["loss/loss"]))
    assert "acc/labelneutID" in metrics


def test_checkpoint_roundtrip(tmp_path):
    cfg, model, ds = tiny_setup()
    opt_cfg = cfg.mode.optimizer
    lr = build_lr_schedule(opt_cfg.lr_schedule, 8, 10)
    optimizer = build_optimizer(opt_cfg, lr)
    st0, labels0 = get_batch(ds, 0, 4)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), st0)
    step = jax.jit(make_train_step(model, optimizer, LossBalanceScheme.focal, lr))
    state, _ = step(state, st0, labels0, None, jax.random.PRNGKey(1))

    mgr = CheckpointManager(tmp_path / "ckpts", keep=2)
    mgr.save(state, int(state.step))
    template = create_train_state(model, optimizer, jax.random.PRNGKey(0), st0)
    restored, rstep = mgr.restore(template)
    assert rstep == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # keep-N GC
    for s in range(2, 6):
        mgr.save(restored, s)
    steps = sorted(
        int(p.stem.split("_")[1]) for p in (tmp_path / "ckpts").glob("*.msgpack")
    )
    assert steps == [4, 5]


def test_dp_step_matches_single_device():
    """shard_map over 8 CPU devices == 1-device step on the same batch and
    the same platform (sync BN + pmean grads make them comparable; the XLA
    backend keeps both sides on identical pure-XLA ops — kernel equality
    has its own on-TPU tests, scripts/check_window_tpu.py)."""
    from jax.sharding import Mesh

    cfg, _, ds = tiny_setup(batch=8)
    cfg = dataclasses.replace(
        cfg,
        framework=dataclasses.replace(cfg.framework, sparse_backend="xla"),
        # dropout masks are drawn per device over LOCAL shapes, so 1-way and
        # 8-way draws differ; zero it for a deterministic comparison
        head=dataclasses.replace(cfg.head, dropout=0.0),
    )
    model_single = build_sparse_classifier(cfg)
    model_dp = build_sparse_classifier(cfg, axis_name="data")
    opt_cfg = cfg.mode.optimizer
    lr = build_lr_schedule(opt_cfg.lr_schedule, 8, 10)
    optimizer = build_optimizer(opt_cfg, lr)

    st, labels = get_batch(ds, 0, 8)
    state = create_train_state(model_single, optimizer, jax.random.PRNGKey(0), st)

    cpu = jax.devices("cpu")
    # 1-device CPU "mesh" reference: identical platform as the 8-way run
    mesh1 = Mesh(np.array(cpu[:1]), ("data",))
    step1 = make_dp_train_step(
        make_train_step(
            model_dp, optimizer, LossBalanceScheme.focal, lr, axis_name="data"
        ),
        mesh1,
        n_batch_args=3,
    )
    st1, labels1 = shard_batch(mesh1, (st, labels))
    state1 = shard_batch(mesh1, state, axis=None) if False else jax.device_put(
        state, jax.sharding.NamedSharding(mesh1, jax.sharding.PartitionSpec())
    )
    s1, m1 = step1(state1, st1, labels1, None, jax.random.PRNGKey(7))

    # 8-way data parallel
    mesh = Mesh(np.array(cpu[:8]), ("data",))
    step8 = make_dp_train_step(
        make_train_step(
            model_dp, optimizer, LossBalanceScheme.focal, lr, axis_name="data"
        ),
        mesh,
        n_batch_args=3,
    )
    st_sh, labels_sh = shard_batch(mesh, (st, labels))
    state8 = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    s8, m8 = step8(state8, st_sh, labels_sh, None, jax.random.PRNGKey(7))

    np.testing.assert_allclose(
        float(m1["loss/loss"]), float(m8["loss/loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s8.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_lr_schedules_match_reference_shapes():
    from sparseeventid_tpu.train import one_cycle, warmup_flat_decay

    sched = warmup_flat_decay(3e-3, 1e-3, 100, 5, 25)
    # warmup start, peak at end of warmup, flat mid, decays to floor
    assert float(sched(0)) == pytest.approx(1e-5)
    assert float(sched(100)) == pytest.approx(3e-3, rel=1e-5)
    assert float(sched(1000)) == pytest.approx(3e-3, rel=1e-5)
    end = float(sched(100 + 19 * 100 + 499))
    assert end < 3e-3 and end > 1e-3
    # past the end -> 0
    assert float(sched(25 * 100 + 1)) == 0.0

    oc = one_cycle(1e-5, 3e-3, 1e-5, 100, 5, 25)
    assert float(oc(0)) == pytest.approx(1e-5)
    up = int(0.5 * 20 * 100)
    assert float(oc(up)) == pytest.approx(3e-3, rel=1e-2)
