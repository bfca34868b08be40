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
