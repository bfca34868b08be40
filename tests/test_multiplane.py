"""Legacy 2D multiplane topology: cross-plane post-merge stage + per-label
final series (reference src/networks/torch/sparseresnet.py:194-334)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparseeventid_tpu import ops
from sparseeventid_tpu.config import load_config
from sparseeventid_tpu.models import build_sparse_classifier
from sparseeventid_tpu.models.encoder import Encoder
from sparseeventid_tpu.train.state import param_count

GRID = (3, 32, 32)  # plane-axis 2D grid


def tiny_cfg(**enc_overrides):
    cfg = load_config(
        "synthetic",
        [
            "encoder.depth=1",
            "encoder.blocks_per_layer=1",
            "encoder.n_initial_filters=4",
            "encoder.n_output_filters=8",
            "framework.min_capacity=64",
            "framework.sparse_backend=xla",
            "framework.remat=false",
            "run.minibatch_size=1",
            "data.dimension=2",
            "data.max_voxels=256",
        ],
    )
    if enc_overrides:
        cfg = dataclasses.replace(
            cfg, encoder=dataclasses.replace(cfg.encoder, **enc_overrides)
        )
    return cfg


def make_st(perturb_plane0=False):
    r = np.random.default_rng(0)
    n = 64
    coords = np.full((1, 256, 3), -1, np.int32)
    pts = np.stack(
        [r.integers(0, g, n) for g in GRID], axis=-1
    ).astype(np.int32)
    pts = np.unique(pts, axis=0)
    coords[0, : len(pts)] = pts
    feats = np.ones((1, 256, 1), np.float32)
    if perturb_plane0:
        feats[0, : len(pts), 0] += 5.0 * (pts[:, 0] == 0)
    return ops.build_sparse_tensor(
        jnp.asarray(coords), jnp.asarray(feats), GRID
    )


def _encode(cfg, st):
    enc = Encoder(
        cfg.encoder, 2, capacities=(256, 128), backend="xla", remat=False
    )
    v = enc.init(jax.random.PRNGKey(0), st, False)
    return enc.apply(v, st, False), v


def test_plane_merge_mixes_planes():
    st_a = make_st(False)
    st_b = make_st(True)  # plane-0 values perturbed; planes 1/2 unchanged

    # plane-shared net: plane-1/2 features must be identical across inputs
    cfg = tiny_cfg(plane_merge_depth=-1)
    out_a, _ = _encode(cfg, st_a)
    out_b, _ = _encode(cfg, st_b)
    other = np.asarray(out_a.coords[0, :, 0]) != 0
    live = np.asarray(out_a.row_mask()[0])
    sel = other & live
    np.testing.assert_allclose(
        np.asarray(out_a.feats[0])[sel], np.asarray(out_b.feats[0])[sel],
        rtol=1e-5,
    )

    # post-merge net (merge from level 0): plane-0 perturbation must leak
    # into plane-1 features through the [3,k,k] kernels
    cfg_m = tiny_cfg(plane_merge_depth=0)
    out_ma, _ = _encode(cfg_m, st_a)
    out_mb, _ = _encode(cfg_m, st_b)
    diff = np.abs(
        np.asarray(out_ma.feats[0])[sel] - np.asarray(out_mb.feats[0])[sel]
    ).max()
    assert diff > 1e-4, "cross-plane merge did not mix planes"


def test_per_label_final_series_params():
    cfg = tiny_cfg()
    st = make_st()
    base = build_sparse_classifier(cfg)
    vb = base.init(jax.random.PRNGKey(0), st, False)

    cfg_pl = tiny_cfg(per_label_final_series=True)
    m = build_sparse_classifier(cfg_pl)
    v = m.init(jax.random.PRNGKey(0), st, False)
    names = set(v["params"].keys())
    for key in ("labelneutID", "labelprotID", "labelcpiID", "labelnpiID"):
        assert f"final_series_{key}" in names
        assert f"head_{key}" in names
    # per-label branches: 4 independent series; head param count unchanged
    # (4 renamed heads == the 4 heads inside the shared MultiHeadOutput)
    series_params = param_count(v["params"]["final_series_labelneutID"])
    head_params = sum(
        param_count(v["params"][f"head_{k}"])
        for k in ("labelneutID", "labelprotID", "labelcpiID", "labelnpiID")
    )
    base_heads = param_count(vb["params"]["head"])
    assert head_params == base_heads
    expected = (
        param_count(vb["params"]) - base_heads + head_params
        + 4 * series_params
    )
    assert param_count(v["params"]) == expected

    logits = m.apply(v, st, False)
    assert set(logits) == {
        "labelneutID", "labelprotID", "labelcpiID", "labelnpiID"
    }
    assert all(np.isfinite(np.asarray(x)).all() for x in logits.values())
