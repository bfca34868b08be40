"""Schema-fidelity tests: read a verbatim-layout larcv3-style fixture that
was built with raw h5py, independently of LarcvWriter.

Real larcv3 files (the OSF dataset the reference trains on,
/root/reference/README.md:19) are unreachable here (zero egress), so this
fixture reconstructs the layout the reference's own h5py accesses prove
exists (/root/reference/src/io/larcv_fetcher.py:307-314,
/root/reference/scripts/calculate_weights.py:5-13) plus the tolerance
contract documented in sparseeventid_tpu/io/larcv.py's module docstring:

- extents field names matched case-insensitively,
- particle compounds with extra fields (track_id, momentum, process) and
  separate vtx_x/vtx_y/vtx_z instead of our writer's ``vertex`` triple,
- particle rows reached through the producer group's extents (NOT row i ==
  event i),
- no in-file detector meta: grid comes from ``image_size=`` (the reference
  hard-codes detector meta too, larcv_fetcher.py:16-57),
- alternatively an ``image_meta`` dataset of JSON strings using larcv3's
  ``number_of_voxels`` key.
"""

import json

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from sparseeventid_tpu.io.larcv import LarcvDataset  # noqa: E402

GRID = (16, 24, 32)

# deliberately NOT the repo's canonical dtypes: capitalized extents fields,
# reordered voxel fields, a particle compound with many extra fields.
EXT_DT = np.dtype([("First", "<u8"), ("N", "<u4")])
VOX_DT = np.dtype([("value", "<f4"), ("id", "<u8")])  # value first
PART_DT = np.dtype(
    [
        ("id", "<u4"),
        ("mcst_index", "<i2"),
        ("track_id", "<u4"),
        ("pdg", "<i4"),
        ("px", "<f8"),
        ("py", "<f8"),
        ("pz", "<f8"),
        ("vtx_x", "<f8"),
        ("vtx_y", "<f8"),
        ("vtx_z", "<f8"),
        ("energy_init", "<f8"),
        ("energy_deposit", "<f8"),
        ("creation_process", "S64"),
    ]
)


def _extents(counts):
    out = np.zeros(len(counts), EXT_DT)
    first = 0
    for i, n in enumerate(counts):
        out[i] = (first, n)
        first += n
    return out


def _write_particle_group(data, name, rows_per_event, pdg, energy, vtx):
    """One producer group; rows_per_event[i] particle rows for event i with
    the event's true particle FIRST (extents-indexed, like real larcv3)."""
    g = data.create_group(name)
    counts = np.asarray(rows_per_event)
    g.create_dataset("extents", data=_extents(counts))
    parts = np.zeros(int(counts.sum()), PART_DT)
    parts["creation_process"] = b"primary"
    row = 0
    for i, n in enumerate(counts):
        parts["pdg"][row] = pdg[i]
        parts["energy_deposit"][row] = energy[i]
        parts["vtx_x"][row], parts["vtx_y"][row], parts["vtx_z"][row] = vtx[i]
        # filler secondary rows with WRONG values: the reader must skip them
        for j in range(1, int(n)):
            parts["pdg"][row + j] = -999
            parts["energy_deposit"][row + j] = -1.0
        row += int(n)
    g.create_dataset("particles", data=parts)


@pytest.fixture(scope="module")
def verbatim_file(tmp_path_factory):
    """4-event 3D fixture in the foreign layout above."""
    path = tmp_path_factory.mktemp("schema") / "verbatim.h5"
    rng = np.random.default_rng(3)
    n_events = 4
    nvox = [37, 5, 61, 12]
    pdg = [2, 0, 1, 2]
    energy = [0.7, 1.3, 2.1, 0.4]
    vtx = [(1.0, 2.0, 3.0), (4.0, 5.0, 6.0), (7.0, 8.0, 9.0), (0.1, 0.2, 0.3)]

    with h5py.File(path, "w") as f:
        data = f.create_group("Data")
        g = data.create_group("sparse3d_dunevoxels_group")
        # one projection per event in 3D
        g.create_dataset("extents", data=_extents([1] * n_events))
        g.create_dataset("voxel_extents", data=_extents(nvox))
        vox = np.zeros(sum(nvox), VOX_DT)
        total = GRID[0] * GRID[1] * GRID[2]
        row = 0
        for n in nvox:
            ids = rng.choice(total, size=n, replace=False)
            vox["id"][row : row + n] = np.sort(ids)
            vox["value"][row : row + n] = rng.uniform(0.5, 3.0, n)
            row += n
        g.create_dataset("voxels", data=vox)
        # NO meta attr anywhere — real files carry none the reference reads

        # label producer: one row per event, but prove extents indexing by
        # ALSO writing a producer with secondary rows
        _write_particle_group(
            data, "particle_neutID_group", [1, 1, 1, 1], pdg, energy, vtx
        )
        _write_particle_group(
            data, "particle_event_group", [2, 1, 3, 1],
            [12, 14, 2212, 111], energy, vtx,
        )
    return str(path), pdg, energy, vtx, nvox


def test_requires_grid_without_meta(verbatim_file):
    path = verbatim_file[0]
    with pytest.raises(ValueError, match="image_size"):
        LarcvDataset(path, "dunevoxels", dimension=3, max_voxels=128)


def test_reads_foreign_layout(verbatim_file):
    path, pdg, energy, vtx, nvox = verbatim_file
    ds = LarcvDataset(
        path, "dunevoxels", dimension=3, max_voxels=128,
        normalize=False, image_size=GRID,
    )
    assert len(ds) == 4
    assert ds.image_size() == GRID
    # labels through case-insensitive extents + extra-field compound
    assert ds.labels["labelneutID"].tolist() == pdg
    # energy/vertex from the FIRST extents row per event, not row i == i
    np.testing.assert_allclose(ds.energy, energy)
    np.testing.assert_allclose(ds.vertex, np.asarray(vtx, np.float32))

    batch = ds.batch([0, 2])
    img = batch["image"]
    assert img.shape == (2, 128, 4)
    with h5py.File(path, "r") as f:
        raw = f["Data/sparse3d_dunevoxels_group/voxels"]
        ev0 = raw[0 : nvox[0]]
    got = img[0][img[0, :, 3] > -998]
    assert len(got) == nvox[0]
    # coordinates are the row-major unravel of the foreign file's ids
    lin = (
        got[:, 0].astype(np.int64) * GRID[1] * GRID[2]
        + got[:, 1].astype(np.int64) * GRID[2]
        + got[:, 2].astype(np.int64)
    )
    np.testing.assert_array_equal(np.sort(lin), np.sort(ev0["id"]))
    np.testing.assert_allclose(
        np.sort(got[:, 3]), np.sort(ev0["value"]), rtol=1e-6
    )


def test_image_meta_dataset_json(tmp_path):
    """larcv3-style per-event image_meta JSON (number_of_voxels key)."""
    path = tmp_path / "meta.h5"
    with h5py.File(path, "w") as f:
        data = f.create_group("Data")
        g = data.create_group("sparse2d_dunevoxels_group")
        g.create_dataset("extents", data=_extents([2]))  # 2 projections
        g.create_dataset("voxel_extents", data=_extents([3, 3]))
        vox = np.zeros(6, VOX_DT)
        vox["id"] = [0, 5, 11, 1, 6, 10]
        vox["value"] = 1.0
        g.create_dataset("voxels", data=vox)
        meta = json.dumps({"number_of_voxels": [3, 4]})
        g.create_dataset(
            "image_meta", data=np.array([meta.encode()] * 2)
        )
    ds = LarcvDataset(
        str(path), "dunevoxels", dimension=2, max_voxels=8,
        normalize=False, read_labels=False,
    )
    assert ds._grid == (3, 4)
    assert ds.n_projections == 2
    b = ds.batch([0])
    assert b["image"].shape == (1, 2, 8, 3)
    # id 5 in a (3,4) row-major grid -> (major y=1, minor x=1); 2D batch
    # stores (x, y, value)
    p0 = b["image"][0, 0]
    live = p0[p0[:, 2] > -998]
    assert {(int(r[0]), int(r[1])) for r in live} == {(0, 0), (1, 1), (3, 2)}
