"""Model construction, forward shapes, and parameter-count sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparseeventid_tpu import ops
from sparseeventid_tpu.config import load_config
from sparseeventid_tpu.config.schema import OUTPUT_SHAPE
from sparseeventid_tpu.io import SyntheticDataset, SyntheticEventConfig
from sparseeventid_tpu.io.transforms import larcv_batch_to_sparse_3d
from sparseeventid_tpu.models import build_sparse_classifier, capacity_schedule
from sparseeventid_tpu.train import param_count


def small_cfg(**overrides):
    ov = [
        "data=synthetic",
        "encoder.depth=2",
        "encoder.blocks_per_layer=1",
        "encoder.n_initial_filters=8",
        "encoder.n_output_filters=16",
        "run.minibatch_size=2",
        "framework.min_capacity=64",
    ] + [f"{k}={v}" for k, v in overrides.items()]
    return load_config("synthetic", ov)


def make_batch(cfg, b=2, seed=0):
    ds = SyntheticDataset(
        8,
        SyntheticEventConfig(image_size=(16, 16, 16), max_voxels=256),
        seed=seed,
    )
    batch = ds.batch(list(range(b)))
    st = larcv_batch_to_sparse_3d(batch["image"], (16, 16, 16))
    labels = {k: jnp.asarray(batch[k]) for k in OUTPUT_SHAPE}
    return st, labels


def test_forward_shapes_and_finiteness():
    cfg = small_cfg()
    # shrink the problem: 16^3 grid, capacity 256
    import dataclasses

    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, max_voxels=256)
    )
    model = build_sparse_classifier(cfg)
    st, labels = make_batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), st, True)
    logits = model.apply(variables, st, False)
    assert set(logits.keys()) == set(OUTPUT_SHAPE)
    for k, n in OUTPUT_SHAPE.items():
        assert logits[k].shape == (2, n)
        assert bool(jnp.all(jnp.isfinite(logits[k])))


def test_capacity_schedule_monotone():
    caps = capacity_schedule(50000, 5, 0.5, 1024)
    # grid-quantum aligned (512 = TILE_T * TILES_PER_STEP) so the window
    # kernels' padded query/output shapes match the arrays exactly
    assert caps[0] == 50176 and caps[0] % 512 == 0
    assert all(c % 512 == 0 for c in caps)
    assert all(a >= b for a, b in zip(caps, caps[1:]))
    assert caps[-1] >= 1024


def test_param_count_matches_architecture_math():
    """Check the initial conv + bottleneck params against closed form."""
    cfg = small_cfg()
    import dataclasses

    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, max_voxels=256)
    )
    model = build_sparse_classifier(cfg)
    st, _ = make_batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), st, True)
    p = variables["params"]["encoder"]
    # initial: 5^3 offsets x 1 in x 8 out (+ bias 8)
    assert p["initial_w"].shape == (125, 1, 8)
    assert p["initial_b"].shape == (8,)
    # depth-2 additive growth: 8 -> 16 -> 24; bottleneck 24 -> 16
    assert p["bottleneck_w"].shape == (1, 24, 16)
    # heads: 16 -> 256 -> n
    hp = variables["params"]["head"]["labelneutID"]
    assert hp["fc1"]["kernel"].shape == (16, 256)
    assert hp["fc2"]["kernel"].shape == (256, 3)


def test_batchnorm_updates_running_stats():
    cfg = small_cfg()
    import dataclasses

    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, max_voxels=256)
    )
    model = build_sparse_classifier(cfg)
    st, _ = make_batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), st, True)
    assert "batch_stats" in variables
    _, mutated = model.apply(
        variables, st, True, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_2d_multiplane_model():
    """dune2d-style model: plane-axis grid, [1,k,k] kernels."""
    import dataclasses

    cfg = small_cfg()
    data = dataclasses.replace(
        cfg.data, dimension=2, max_voxels=128
    )
    cfg = dataclasses.replace(cfg, data=data)
    model = build_sparse_classifier(cfg)

    rng = np.random.default_rng(0)
    grid = (3, 32, 32)
    coords = np.full((2, 128, 3), -1, np.int32)
    feats = np.zeros((2, 128, 1), np.float32)
    for b in range(2):
        n = 50
        coords[b, :n] = np.stack(
            [rng.integers(0, g, n) for g in grid], axis=-1
        )
        feats[b, :n, 0] = rng.standard_normal(n)
    st = ops.build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats), grid)
    variables = model.init(jax.random.PRNGKey(0), st, True)
    logits = model.apply(variables, st, False)
    assert logits["labelneutID"].shape == (2, 3)
    # plane axis must never shrink: check downsample grids kept dim0 == 3
    # (stride (1,2,2)) by running the encoder alone
    from sparseeventid_tpu.models import Encoder

    enc = Encoder(cfg.encoder, dimension=2)
    ev = enc.init(jax.random.PRNGKey(0), st, True)
    encoded = enc.apply(ev, st, False)
    assert encoded.grid_shape[0] == 3


def test_pooling_downsample_window_equals_xla():
    """Pool + 1x1 == tied-weight strided conv: the window fast path for
    downsampling=pooling (reference sparse_building_blocks.py:142-168)
    must match the XLA gather path bit-for-bit in f32."""
    import dataclasses

    from sparseeventid_tpu.models.blocks import PoolingDownsample
    from sparseeventid_tpu.config.schema import DownSampling

    cfg = small_cfg(**{"encoder.downsampling": "pooling"})
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, max_voxels=256)
    )
    st, _ = make_batch(cfg)
    p = dataclasses.replace(cfg.encoder, downsampling=DownSampling.pooling)

    def run(backend):
        mod = PoolingDownsample(
            n_out=16, stride=(2, 2, 2), params=p,
            out_capacity=128, backend=backend,
        )
        variables = mod.init(jax.random.PRNGKey(3), st, True)
        return mod.apply(variables, st, False)

    a = run("xla")
    b = run("window")
    # identical site sets (same ascending-key skeleton construction)
    assert bool(jnp.all(a.n_active == b.n_active))
    np.testing.assert_allclose(
        np.asarray(a.feats, np.float32), np.asarray(b.feats, np.float32),
        rtol=2e-5, atol=2e-5,
    )


def test_pooling_encoder_trains_with_window_backend():
    """downsampling=pooling end-to-end through the window engine: grads
    finite and the tied 1x1 weight receives gradient."""
    import dataclasses

    cfg = small_cfg(**{
        "encoder.downsampling": "pooling",
        "framework.sparse_backend": "window",
    })
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, max_voxels=256)
    )
    model = build_sparse_classifier(cfg)
    st, labels = make_batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), st, True)

    def loss_fn(params):
        logits = model.apply({**variables, "params": params}, st, False)
        return sum(jnp.mean(v.astype(jnp.float32) ** 2) for v in logits.values())

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    pool_w = [
        g for path, g in flat
        if "down_0" in jax.tree_util.keystr(path) and g.ndim == 3
    ]
    assert pool_w, "pooling 1x1 weight missing from grads"
    assert all(bool(jnp.all(jnp.isfinite(g))) for _, g in flat)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in pool_w)
