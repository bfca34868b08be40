"""Detector preprocessing parity (scripts/preprocess_fullres_3d.py vs the
reference larcv ProcessDriver config preprocess_fullres_3D.cfg:1-55):
threshold, empty-tensor filter, EventPIDLabel energy thresholds."""

import json
import subprocess
import sys
from pathlib import Path

import h5py
import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _write_raw(path, events):
    """events: list of (ids, vals, particles[(pdg, edep)])."""
    EXT = np.dtype([("first", "<u8"), ("n", "<u4")])
    VOX = np.dtype([("id", "<u8"), ("value", "<f4")])
    PART = np.dtype([("id", "<u8"), ("pdg", "<i4"), ("energy_deposit", "<f8")])
    extents, vext, voxels = [], [], []
    p_ext, parts = [], []
    for ids, vals, plist in events:
        extents.append((len(vext), 1))
        vext.append((len(voxels), len(ids)))
        voxels.extend(zip(ids.tolist(), vals.tolist()))
        p_ext.append((len(parts), len(plist)))
        for pdg, edep in plist:
            parts.append((len(parts), pdg, edep))
    with h5py.File(path, "w") as f:
        g = f.require_group("Data/sparse3d_sbndvoxels_group")
        g.create_dataset("extents", data=np.array(extents, EXT))
        g.create_dataset("voxel_extents", data=np.array(vext, EXT))
        g.create_dataset("voxels", data=np.array(voxels, VOX))
        g2 = f.require_group("Data/particle_sbndseg_group")
        g2.create_dataset("extents", data=np.array(p_ext, EXT))
        g2.create_dataset("particles", data=np.array(parts, PART))


def test_preprocess_threshold_filter_and_labels(tmp_path):
    raw = tmp_path / "raw.h5"
    out = tmp_path / "out.h5"
    r = np.random.default_rng(0)
    ids = np.sort(r.choice(10_000, 200, replace=False)).astype(np.uint64)
    vals_hi = np.full(200, 1.0, np.float32)
    vals_lo = np.full(200, 0.05, np.float32)  # all below threshold 0.1
    events = [
        # nu_mu CC with 1 proton above 20 MeV, a charged pion above 10 MeV
        (ids, vals_hi, [(13, 0.5), (2212, 0.03), (211, 0.02)]),
        # dropped: fewer than 50 voxels survive the threshold
        (ids, vals_lo, [(13, 0.5)]),
        # nu_e CC, 3 protons (clamped to 2), neutral pion
        (ids, vals_hi, [(11, 0.4), (2212, 0.03), (2212, 0.05),
                        (2212, 0.021), (111, 0.001)]),
        # NC (no primary lepton deposit), sub-threshold proton
        (ids, vals_hi, [(2212, 0.001), (22, 0.1)]),
    ]
    _write_raw(raw, events)
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts/preprocess_fullres_3d.py"),
         str(raw), str(out)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert info["kept"] == 3 and info["dropped_empty"] == 1

    with h5py.File(out, "r") as f:
        neut = f["Data/particle_neutID_group/particles"]["pdg"][:]
        prot = f["Data/particle_protID_group/particles"]["pdg"][:]
        cpi = f["Data/particle_cpiID_group/particles"]["pdg"][:]
        npi = f["Data/particle_npiID_group/particles"]["pdg"][:]
        vox = f["Data/sparse3d_sbndvoxels_group/voxels"]["value"][:]
    assert neut.tolist() == [1, 0, 2]
    assert prot.tolist() == [1, 2, 0]
    assert cpi.tolist() == [1, 0, 0]
    assert npi.tolist() == [0, 1, 0]
    assert (vox > 0.1).all()  # threshold applied


def _write_raw_2d(path, events, n_planes=3):
    """events: list of (per-plane [(ids, vals)], particles[(pdg, edep)])."""
    EXT = np.dtype([("first", "<u8"), ("n", "<u4")])
    VOX = np.dtype([("id", "<u8"), ("value", "<f4")])
    PART = np.dtype([("id", "<u8"), ("pdg", "<i4"), ("energy_deposit", "<f8")])
    extents, vext, voxels = [], [], []
    p_ext, parts = [], []
    for planes, plist in events:
        extents.append((len(vext), len(planes)))
        for ids, vals in planes:
            vext.append((len(voxels), len(ids)))
            voxels.extend(zip(ids.tolist(), vals.tolist()))
        p_ext.append((len(parts), len(plist)))
        for pdg, edep in plist:
            parts.append((len(parts), pdg, edep))
    with h5py.File(path, "w") as f:
        g = f.require_group("Data/sparse2d_sbndvoxels_group")
        g.create_dataset("extents", data=np.array(extents, EXT))
        g.create_dataset("voxel_extents", data=np.array(vext, EXT))
        g.create_dataset("voxels", data=np.array(voxels, VOX))
        g2 = f.require_group("Data/particle_sbndseg_group")
        g2.create_dataset("extents", data=np.array(p_ext, EXT))
        g2.create_dataset("particles", data=np.array(parts, PART))


def test_preprocess_2d_embed_threshold_and_labels(tmp_path):
    """2D twin (scripts/preprocess_fullres_2d.py vs
    preprocess_fullres_2D.cfg:1-60): per-plane threshold 0.01,
    MinVoxel2DCount=25, CompressAndEmbed id re-linearization into the
    centered 2048x1280 grid."""
    raw = tmp_path / "raw2d.h5"
    out = tmp_path / "out2d.h5"
    r = np.random.default_rng(1)
    # input grid 1024x640 -> embed into 2048x1280 (offset +512 rows,
    # +320 cols)
    in_rows, in_cols = 1024, 640
    ids = np.sort(r.choice(in_rows * in_cols, 100, replace=False)).astype(
        np.uint64
    )
    hi = np.full(100, 0.5, np.float32)
    lo = np.full(100, 0.005, np.float32)  # below threshold 0.01
    plane = (ids, hi)
    events = [
        ([plane, plane, plane], [(13, 0.5), (2212, 0.03)]),
        # dropped: all voxels below threshold on every plane
        ([(ids, lo)] * 3, [(13, 0.5)]),
    ]
    _write_raw_2d(raw, events)
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts/preprocess_fullres_2d.py"),
         str(raw), str(out), "--input-rows", str(in_rows),
         "--input-cols", str(in_cols)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert info["kept"] == 1 and info["dropped_empty"] == 1

    with h5py.File(out, "r") as f:
        g = f["Data/sparse2d_sbndvoxels_group"]
        assert json.loads(g.attrs["meta"])["n_voxels"] == [3, 2048, 1280]
        vox = g["voxels"][:]
        neut = f["Data/particle_neutID_group/particles"]["pdg"][:]
    assert neut.tolist() == [1]
    # embed math: id -> (row + 512) * 1280 + (col + 320)
    row, col = ids // in_cols, ids % in_cols
    want = ((row + 512) * 1280 + (col + 320)).astype(np.uint64)
    got = vox["id"][:100]
    np.testing.assert_array_equal(np.sort(got), np.sort(want))
    assert (vox["value"] > 0.01).all()
