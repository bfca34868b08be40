"""IO layer: larcv3-schema HDF5 roundtrip, batch loader, transforms."""

import numpy as np
import pytest

from sparseeventid_tpu.config.schema import AccessMode, OUTPUT_SHAPE
from sparseeventid_tpu.io import SyntheticDataset, SyntheticEventConfig
from sparseeventid_tpu.io.dataset import BatchLoader
from sparseeventid_tpu.io.larcv import (
    LarcvDataset,
    write_synthetic_larcv_file,
)
from sparseeventid_tpu.io.transforms import (
    larcv_batch_to_dense,
    larcv_batch_to_pointcloud,
    larcv_batch_to_sparse_3d,
)


@pytest.fixture(scope="module")
def larcv_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "train.h5"
    write_synthetic_larcv_file(path, n_events=12, image_size=(32, 32, 32), seed=7)
    return path


def test_larcv_roundtrip_matches_synthetic(larcv_file):
    ds = LarcvDataset(
        larcv_file, "dunevoxels", dimension=3, max_voxels=4096, normalize=False
    )
    assert len(ds) == 12
    assert ds.image_size() == (32, 32, 32)
    syn = SyntheticDataset(
        12, SyntheticEventConfig(image_size=(32, 32, 32), normalize=False), seed=7
    )
    batch = ds.batch([0, 3])
    coords0, vals0, labels0, _aux0 = syn.event(0)
    img = batch["image"][0]
    valid = img[:, 3] != -999.0
    got_coords = img[valid][:, :3].astype(np.int32)
    got_vals = img[valid][:, 3]
    # reader returns voxels sorted by linear id (writer wrote unique sorted)
    order = np.lexsort(coords0.T[::-1])
    np.testing.assert_array_equal(got_coords, coords0[order])
    np.testing.assert_allclose(got_vals, vals0[order], rtol=1e-6)
    for k in OUTPUT_SHAPE:
        assert batch[k][0] == labels0[k]
    assert "energy" in batch


def test_larcv_normalization(larcv_file):
    ds = LarcvDataset(
        larcv_file, "dunevoxels", dimension=3, max_voxels=4096, normalize=True
    )
    img = ds.batch([1])["image"][0]
    vals = img[img[:, 3] != -999.0][:, 3]
    assert abs(vals.mean() - 1.0) < 1e-3
    assert abs(vals.std() - 0.5) < 1e-3


def test_larcv_max_voxels_truncation(larcv_file):
    ds = LarcvDataset(
        larcv_file, "dunevoxels", dimension=3, max_voxels=10, normalize=False
    )
    img = ds.batch([0])["image"][0]
    assert img.shape == (10, 4)
    assert np.all(img[:, 3] != -999.0)


def test_batch_loader_sharding(larcv_file):
    ds = LarcvDataset(larcv_file, "dunevoxels", max_voxels=512, normalize=False)
    seen = []
    for rank in range(3):
        loader = BatchLoader(
            ds, 2, access_mode=AccessMode.serial_access,
            process_index=rank, process_count=3,
        )
        seen.append(set(loader.indices.tolist()))
        loader.stop()
    # disjoint shards covering all events
    assert seen[0] | seen[1] | seen[2] == set(range(12))
    assert not (seen[0] & seen[1])


def test_batch_loader_prefetch_and_epoch():
    ds = SyntheticDataset(16, SyntheticEventConfig(image_size=(16, 16, 16)))
    loader = BatchLoader(ds, 4, access_mode=AccessMode.random_events, seed=1)
    b1 = next(loader)
    assert b1["image"].shape == (4, 2048, 4)
    assert len(loader) == 4
    loader.stop()


def test_pointcloud_transform():
    ds = SyntheticDataset(4, SyntheticEventConfig(image_size=(16, 16, 16)))
    batch = ds.batch([0, 1])
    pts, mask = larcv_batch_to_pointcloud(batch["image"], max_points=128)
    assert pts.shape == (2, 128, 4)
    assert mask.sum() > 0
    # masked points are zero
    assert np.all(pts[~mask] == 0)


def test_dense_transform_roundtrip():
    ds = SyntheticDataset(
        4, SyntheticEventConfig(image_size=(8, 8, 8), max_voxels=64)
    )
    batch = ds.batch([0])
    dense = larcv_batch_to_dense(batch["image"], (8, 8, 8))
    st = larcv_batch_to_sparse_3d(batch["image"], (8, 8, 8))
    from sparseeventid_tpu import ops

    np.testing.assert_allclose(np.asarray(ops.to_dense(st)), dense, rtol=1e-6)


def test_file_premerge_chunks(tmp_path, larcv_file):
    """scripts/file_premerge.py: chunked merge preserves every event in
    file order (/root/reference/scripts/file_premerge.py:12-33 parity)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "file_premerge",
        Path(__file__).resolve().parents[1] / "scripts" / "file_premerge.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # three 12-event inputs, chunk size 2 -> chunks of 24 and 12 events
    inputs = [larcv_file]
    for i in range(2):
        p = tmp_path / f"in{i}.h5"
        write_synthetic_larcv_file(p, n_events=12, image_size=(32, 32, 32),
                                   seed=10 + i)
        inputs.append(p)
    written = mod.premerge(inputs, str(tmp_path / "pre"), chunk_size=2)
    assert [p.name for p in written] == ["pre_chunk2_0.h5", "pre_chunk2_1.h5"]

    merged = [
        LarcvDataset(p, "dunevoxels", dimension=3, max_voxels=4096,
                     normalize=False)
        for p in written
    ]
    assert [len(d) for d in merged] == [24, 12]
    sources = [
        LarcvDataset(p, "dunevoxels", dimension=3, max_voxels=4096,
                     normalize=False)
        for p in inputs
    ]
    flat = [(d, i) for d in sources for i in range(len(d))]
    out_flat = [(d, i) for d in merged for i in range(len(d))]
    for (sd, si), (od, oi) in zip(flat, out_flat):
        np.testing.assert_array_equal(
            sd.batch([si])["image"][0], od.batch([oi])["image"][0]
        )
        for k in OUTPUT_SHAPE:
            assert sd.batch([si])[k][0] == od.batch([oi])[k][0]
