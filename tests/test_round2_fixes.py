"""Round-2 correctness fixes (VERDICT r1 weak items + ADVICE):
encoder freeze on transfer, overflow-drop metrics, epoch permutation,
2D coordinate-order contract, even-scheme class weights."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sparseeventid_tpu.config import load_config
from sparseeventid_tpu.config.schema import AccessMode, LossBalanceScheme, OUTPUT_SHAPE
from sparseeventid_tpu.io import SyntheticDataset, SyntheticEventConfig
from sparseeventid_tpu.io.dataset import BatchLoader
from sparseeventid_tpu.io.transforms import (
    larcv_batch_to_sparse_2d,
    larcv_batch_to_sparse_3d,
)
from sparseeventid_tpu.models import build_sparse_classifier
from sparseeventid_tpu.train import (
    build_lr_schedule,
    build_optimizer,
    create_train_state,
    make_train_step,
)
from sparseeventid_tpu.utils import encoder_freeze_mask

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


# --------------------------------------------------------------- freeze
def test_encoder_freeze_multi_transform():
    """With the freeze wrapper (create_trainer.py:94-106 parity), encoder
    params are bit-identical after N steps while head params move."""
    cfg, model, ds = tiny_setup()
    opt_cfg = cfg.mode.optimizer
    lr = build_lr_schedule(opt_cfg.lr_schedule, 8, 10)
    optimizer = optax.multi_transform(
        {
            "trainable": build_optimizer(opt_cfg, lr),
            "frozen": optax.set_to_zero(),
        },
        encoder_freeze_mask,
    )
    st0, labels0 = get_batch(ds, 0, 4)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), st0)
    enc_before = jax.device_get(state.params["encoder"])
    head_before = jax.device_get(
        {k: v for k, v in state.params.items() if k != "encoder"}
    )
    step = jax.jit(make_train_step(model, optimizer, LossBalanceScheme.focal, lr))
    for i in range(3):
        st, labels = get_batch(ds, i, 4)
        state, _ = step(state, st, labels, None, jax.random.PRNGKey(i))
    enc_after = jax.device_get(state.params["encoder"])
    head_after = jax.device_get(
        {k: v for k, v in state.params.items() if k != "encoder"}
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(enc_before), jax.tree_util.tree_leaves(enc_after)
    ):
        np.testing.assert_array_equal(a, b)
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(head_before),
            jax.tree_util.tree_leaves(head_after),
        )
    )
    assert moved, "head params did not train"


# ------------------------------------------------------ overflow metric
def test_overflow_dropped_metric_fires():
    """An undersized downsample capacity must surface in the
    overflow/dropped train metric instead of silently corrupting
    (window_engine.py ov_dropped / downsample_sites truncation)."""
    cfg, model, ds = tiny_setup()
    # choke the downsample capacities so site truncation fires
    model_choked = dataclasses.replace(
        build_sparse_classifier(cfg), capacities=(CAP, 8, 8)
    )

    opt_cfg = cfg.mode.optimizer
    lr = build_lr_schedule(opt_cfg.lr_schedule, 8, 10)
    optimizer = build_optimizer(opt_cfg, lr)
    st0, labels0 = get_batch(ds, 0, 4)
    state = create_train_state(model_choked, optimizer, jax.random.PRNGKey(0), st0)
    step = jax.jit(
        make_train_step(model_choked, optimizer, LossBalanceScheme.focal, lr)
    )
    _, metrics = step(state, st0, labels0, None, jax.random.PRNGKey(1))
    assert "overflow/dropped" in metrics
    assert int(metrics["overflow/dropped"]) > 0

    # sane capacities -> no drops
    model_ok = build_sparse_classifier(cfg)
    state2 = create_train_state(model_ok, optimizer, jax.random.PRNGKey(0), st0)
    step2 = jax.jit(make_train_step(model_ok, optimizer, LossBalanceScheme.focal, lr))
    _, m2 = step2(state2, st0, labels0, None, jax.random.PRNGKey(1))
    assert int(m2["overflow/dropped"]) == 0


# ------------------------------------------------------ epoch semantics
def test_epoch_permutation_covers_every_event_once():
    # drive the index logic directly (the prefetch thread would otherwise
    # race this test for indices)
    loader = BatchLoader.__new__(BatchLoader)
    loader.indices = np.arange(12)
    loader.batch_size = 4
    loader.access_mode = AccessMode.random_events
    loader.rng = np.random.default_rng(3)
    loader._cursor = 0
    loader._perm = None
    loader._perm_pos = 0
    idx_log = [loader._next_indices() for _ in range(6)]  # two epochs
    flat = np.concatenate(idx_log)
    first_epoch, second_epoch = flat[:12], flat[12:]
    assert sorted(first_epoch.tolist()) == list(range(12))
    assert sorted(second_epoch.tolist()) == list(range(12))
    # and it's a shuffle, not serial order
    assert not np.array_equal(first_epoch, np.arange(12))


# ------------------------------------------------- 2D coordinate order
def test_2d_coordinate_order_contract():
    """Pin the reference contract (data_transforms.py:242): stored larcv
    (x, y, value) becomes coords [plane, y, x] against (planes, H, W)."""
    h, w = 8, 4
    image = np.full((1, 2, 4, 3), -999.0, np.float32)
    # one pixel on plane 1 at stored x=3, y=7 (y can exceed W to prove the
    # axis mapping: it must land on the H axis)
    image[0, 1, 0] = [3.0, 7.0, 2.5]
    st = larcv_batch_to_sparse_2d(image, (2, h, w))
    coords = np.asarray(st.coords[0])
    feats = np.asarray(st.feats[0])
    active = int(st.n_active[0])
    assert active == 1
    live = coords[(coords != -1).all(axis=1)]
    assert live.shape == (1, 3)
    np.testing.assert_array_equal(live[0], [1, 7, 3])  # [plane, y, x]
    assert feats[(coords != -1).all(axis=1)][0, 0] == pytest.approx(2.5)

    # out-of-grid pixels (x >= W) are dropped, not wrapped
    image2 = np.full((1, 1, 2, 3), -999.0, np.float32)
    image2[0, 0, 0] = [5.0, 2.0, 1.0]  # x=5 >= W=4
    st2 = larcv_batch_to_sparse_2d(image2, (1, h, w))
    assert int(st2.n_active[0]) == 0


def test_2d_roundtrip_synthetic_multiplane():
    """Synthetic 2D multiplane batches land in-grid under the new order."""
    ds = SyntheticDataset(
        4,
        SyntheticEventConfig(image_size=(16, 16, 16), n_planes=3, max_voxels=128),
        seed=2,
    )
    batch = ds.batch([0, 1])
    st = larcv_batch_to_sparse_2d(batch["image"], (3, 16, 16))
    coords = np.asarray(st.coords)
    mask = (coords != -1).all(axis=-1)
    assert mask.sum() > 0
    live = coords[mask]
    assert (live[:, 0] < 3).all()
    assert (live[:, 1] < 16).all() and (live[:, 2] < 16).all()


# ------------------------------------------------- even-scheme weights
def test_even_scheme_class_weights_change_loss():
    from sparseeventid_tpu.train.losses import smoothed_cross_entropy

    logits = jnp.asarray([[2.0, -1.0], [0.5, 0.5]])
    labels = jnp.asarray([0, 1])
    base = float(smoothed_cross_entropy(logits, labels, 0.1, None))
    weighted = float(
        smoothed_cross_entropy(logits, labels, 0.1, jnp.asarray([0.582, 1.417]))
    )
    assert base != pytest.approx(weighted)
    # weighted mean semantics: per-class weight 1 == unweighted
    unit = float(
        smoothed_cross_entropy(logits, labels, 0.1, jnp.asarray([1.0, 1.0]))
    )
    assert unit == pytest.approx(base, rel=1e-6)
