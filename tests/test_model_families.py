"""PointNet / DGCNN / dense-mode model families: shapes, masking, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparseeventid_tpu.config.schema import ConvRepresentation, OUTPUT_SHAPE
from sparseeventid_tpu.io import SyntheticDataset, SyntheticEventConfig
from sparseeventid_tpu.io.transforms import (
    larcv_batch_to_dense,
    larcv_batch_to_pointcloud,
)
from sparseeventid_tpu.models.dense import DenseEventClassifier
from sparseeventid_tpu.models.dgcnn import DGCNNClassifier, knn_indices
from sparseeventid_tpu.models.pointnet import PointNetClassifier


def pc_batch(b=2, p=64):
    ds = SyntheticDataset(8, SyntheticEventConfig(image_size=(16, 16, 16)))
    batch = ds.batch(list(range(b)))
    pts, mask = larcv_batch_to_pointcloud(batch["image"], max_points=p)
    return jnp.asarray(pts), jnp.asarray(mask), batch


def test_pointnet_3d_shapes_and_training_step():
    pts, mask, _ = pc_batch()
    model = PointNetClassifier(OUTPUT_SHAPE)
    variables = model.init(jax.random.PRNGKey(0), pts, mask, True)
    logits = model.apply(variables, pts, mask, False)
    assert logits["labelneutID"].shape == (2, 3)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in logits.values())

    def loss(params):
        lg = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, mask, True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats", "losses"],
        )[0]
        return sum(jnp.sum(v**2) for v in lg.values())

    g = jax.grad(loss)(variables["params"])
    assert all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(g)
    )


def test_pointnet_mask_invariance():
    """Padded points must not affect the output."""
    pts, mask, _ = pc_batch()
    model = PointNetClassifier(OUTPUT_SHAPE, use_tnet=True)
    variables = model.init(jax.random.PRNGKey(0), pts, mask, True)
    out1 = model.apply(variables, pts, mask, False)
    # scramble padded entries
    noise = jnp.where(mask[..., None], pts, 123.0)
    out2 = model.apply(variables, noise, mask, False)
    for k in out1:
        np.testing.assert_allclose(
            np.asarray(out1[k]), np.asarray(out2[k]), rtol=1e-4, atol=1e-5
        )


def test_knn_excludes_padding():
    pts, mask, _ = pc_batch(b=1, p=32)
    idx = knn_indices(pts, mask, k=4)
    n_valid = int(mask[0].sum())
    assert n_valid > 4
    valid_rows = np.asarray(idx[0][:n_valid])
    assert valid_rows.max() < n_valid  # neighbors only among valid points


def test_dgcnn_shapes():
    pts, mask, _ = pc_batch(b=2, p=48)
    model = DGCNNClassifier(OUTPUT_SHAPE, k=8)
    variables = model.init(jax.random.PRNGKey(0), pts, mask, True)
    logits = model.apply(variables, pts, mask, False)
    assert logits["labelprotID"].shape == (2, 3)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in logits.values())


def test_dgcnn_multiplane():
    pts, mask, _ = pc_batch(b=2, p=32)
    pts2 = jnp.stack([pts, pts, pts], axis=1)  # [B, 3, P, F]
    mask2 = jnp.stack([mask, mask, mask], axis=1)
    model = DGCNNClassifier(OUTPUT_SHAPE, k=4)
    variables = model.init(jax.random.PRNGKey(0), pts2, mask2, True)
    logits = model.apply(variables, pts2, mask2, False)
    assert logits["labelcpiID"].shape == (2, 2)


def test_dense_classifier_3d():
    ds = SyntheticDataset(
        4, SyntheticEventConfig(image_size=(16, 16, 16), max_voxels=256)
    )
    batch = ds.batch([0, 1])
    dense = jnp.asarray(larcv_batch_to_dense(batch["image"], (16, 16, 16)))
    cfg = ConvRepresentation(
        depth=2, n_initial_filters=4, n_output_filters=8, blocks_per_layer=1
    )
    model = DenseEventClassifier(cfg, OUTPUT_SHAPE, dimension=3)
    variables = model.init(jax.random.PRNGKey(0), dense, True)
    logits = model.apply(variables, dense, False)
    assert logits["labelneutID"].shape == (2, 3)


def test_dense_classifier_2d_multiplane():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 32, 32, 1)).astype(np.float32))
    cfg = ConvRepresentation(
        depth=2, n_initial_filters=4, n_output_filters=8, blocks_per_layer=1
    )
    model = DenseEventClassifier(cfg, OUTPUT_SHAPE, dimension=2)
    variables = model.init(jax.random.PRNGKey(0), x, True)
    logits = model.apply(variables, x, False)
    assert logits["labelneutID"].shape == (2, 3)
