"""SimCLR, vertex-finding, unsupervised tasks + augmentations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparseeventid_tpu.config.schema import ConvRepresentation, OptimizerConfig
from sparseeventid_tpu.io import SyntheticDataset, SyntheticEventConfig
from sparseeventid_tpu.io.augment import augment_larcv_batch
from sparseeventid_tpu.io.transforms import larcv_batch_to_sparse_3d
from sparseeventid_tpu.train import build_lr_schedule, build_optimizer
from sparseeventid_tpu.train.representation import (
    RepresentationModel,
    make_simclr_train_step,
)
from sparseeventid_tpu.train.state import create_train_state
from sparseeventid_tpu.train.unsupervised import (
    expgauss,
    weak_labels_from_energy,
)
from sparseeventid_tpu.train.vertex import (
    VertexModel,
    build_vertex_labels,
    make_vertex_train_step,
    predict_vertex,
    vertex_resolution_metrics,
)

GRID = (16, 16, 16)
ENC = ConvRepresentation(
    depth=2, n_initial_filters=8, n_output_filters=16, blocks_per_layer=1
)


def batches(b=4, seed=0):
    ds = SyntheticDataset(
        8, SyntheticEventConfig(image_size=GRID, max_voxels=256), seed=seed
    )
    return ds.batch(list(range(b)))


def test_augmentations_preserve_contract():
    batch = batches()
    rng = np.random.default_rng(0)
    aug = augment_larcv_batch(batch["image"], GRID, rng)
    assert aug.shape == batch["image"].shape
    valid = np.all(aug[..., :3] != -999.0, axis=-1)
    coords = aug[valid][:, :3]
    assert coords.min() >= 0 and coords.max() < 16
    # views differ
    assert not np.array_equal(aug, batch["image"])


def test_simclr_step_decreases_loss():
    batch = batches()
    rng_np = np.random.default_rng(1)
    v1 = larcv_batch_to_sparse_3d(
        augment_larcv_batch(batch["image"], GRID, rng_np), GRID
    )
    v2 = larcv_batch_to_sparse_3d(
        augment_larcv_batch(batch["image"], GRID, rng_np), GRID
    )
    model = RepresentationModel(ENC, dimension=3, projection_dim=16)
    lr = build_lr_schedule(OptimizerConfig().lr_schedule, 4, 4)
    opt = build_optimizer(OptimizerConfig(), lr)
    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), v1, v2, True
    )
    from sparseeventid_tpu.train.state import TrainState

    state = TrainState(
        variables["params"], variables.get("batch_stats", {}),
        opt.init(variables["params"]), jnp.zeros((), jnp.int32),
    )
    step = jax.jit(make_simclr_train_step(model, opt, lr))
    losses = []
    for i in range(6):
        state, m = step(state, v1, v2, None, jax.random.PRNGKey(2))
        losses.append(float(m["loss/loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert "acc/top1" in m and "acc/top5" in m


def test_vertex_labels_and_prediction_roundtrip():
    full = (64, 64, 64)
    anchor = (8, 8, 8)
    v = jnp.asarray([[10.5, 33.0, 60.9], [0.0, 0.0, 0.0]], jnp.float32)
    obj, off, cell = build_vertex_labels(v, anchor, full)
    assert obj.shape == (2, 8, 8, 8)
    assert float(obj.sum()) == 2.0
    np.testing.assert_array_equal(np.asarray(cell[0]), [1, 4, 7])
    # a perfect prediction recovers the vertex
    pred = jnp.zeros((2, 8, 8, 8, 4))
    logit_off = jnp.log(off / (1 - off + 1e-9) + 1e-9)
    b_idx = jnp.arange(2)
    pred = pred.at[b_idx, cell[:, 0], cell[:, 1], cell[:, 2], 0].set(10.0)
    pred = pred.at[b_idx, cell[:, 0], cell[:, 1], cell[:, 2], 1:].set(logit_off)
    rec = predict_vertex(pred, anchor, full)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(v), atol=0.2)
    m = vertex_resolution_metrics(rec, v)
    assert float(m["vertex/frac_5cm"]) == 1.0


def test_vertex_train_step_runs():
    batch = batches()
    st = larcv_batch_to_sparse_3d(batch["image"], GRID)
    model = VertexModel(ENC, dimension=3)
    lr = build_lr_schedule(OptimizerConfig().lr_schedule, 4, 4)
    opt = build_optimizer(OptimizerConfig(), lr)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), st, True
    )
    from sparseeventid_tpu.train.state import TrainState

    state = TrainState(
        variables["params"], variables.get("batch_stats", {}),
        opt.init(variables["params"]), jnp.zeros((), jnp.int32),
    )
    anchor_grid = (4, 4, 4)  # 16 / 2**2
    step = jax.jit(
        make_vertex_train_step(model, opt, anchor_grid, GRID, lr)
    )
    vert = jnp.asarray(
        np.random.default_rng(0).uniform(0, 16, (4, 3)), jnp.float32
    )
    evt = jnp.zeros(4, jnp.int32)
    state, m = step(state, st, vert, evt, None, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss/loss"]))
    assert "vertex/frac_10cm" in m


def test_expgauss_weak_labels():
    rng = np.random.default_rng(0)
    energies = np.concatenate(
        [rng.normal(10, 1, 500), rng.exponential(5, 500) + 12]
    )
    out = weak_labels_from_energy(energies)
    labels = out["weak_label"]
    assert labels.shape == (1000,)
    assert 0 < labels.sum() < 1000
    # expgauss evaluates finitely
    y = expgauss(np.linspace(0, 30, 50), 100.0, 10.0, 1.0, 0.5)
    assert np.isfinite(y).all()
