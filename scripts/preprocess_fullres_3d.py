#!/usr/bin/env python
"""Detector preprocessing: raw simulation file -> training-ready labeled
sparse tensors — the role of the reference's larcv3 ProcessDriver config
(/root/reference/larcv_scripts/preprocess_fullres_3D.cfg:1-55), re-implemented
against the in-repo reader/writer instead of the larcv3 C++ processes:

  * Threshold          (value > 0.1, Cluster3DThreshold)
  * EmptyTensorFilter  (MinVoxel3DCount = 50)
  * EventPIDLabel      (proton 20 MeV / charged pion 10 MeV / neutral pion
                        0 MeV energy thresholds -> neutID/protID/cpiID/npiID
                        label particles, one per event)
  * TensorFromCluster3D (voxel ids pass through: the raw file already holds
                        linearized voxel ids per event)

Input schema: ``Data/sparse3d_<producer>_group`` voxels +
``Data/particle_<producer>_group`` with the FULL per-event particle list
(pdg + energy_deposit per particle).  Output: the training schema written by
io/larcv.py's LarcvWriter (4 single-particle label producers + 'event').

Usage:
  python scripts/preprocess_fullres_3d.py raw.h5 out.h5 \
      --producer sbndvoxels --particle-producer sbndseg
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sparseeventid_tpu.io.larcv import LarcvWriter  # noqa: E402

# preprocess_fullres_3D.cfg ProcessList parameters
THRESHOLD = 0.1
MIN_VOXEL_COUNT = 50
PROTON_THRESHOLD = 0.020  # GeV
CPI_THRESHOLD = 0.010
NPI_THRESHOLD = 0.000

# dune3d detector meta (larcv_fetcher.py:37-56)
META = dict(
    n_voxels=[1024, 512, 1280],
    size=[409.6, 204.8, 516.0],
    origin=[0.0, -100.0, 0.0],
)


def event_pid_labels(pdg: np.ndarray, edep: np.ndarray):
    """EventPIDLabel semantics: classify the event from its particle list.

    neutID: 0 = nu_e CC (primary e), 1 = nu_mu CC (primary mu), 2 = NC.
    protID: number of protons above threshold, clamped to 2.
    cpiID / npiID: presence of charged / neutral pions above threshold.
    """
    apdg = np.abs(pdg)
    if np.any((apdg == 11) & (edep > 0)):
        neut = 0
    elif np.any((apdg == 13) & (edep > 0)):
        neut = 1
    else:
        neut = 2
    prot = int(min(np.sum((pdg == 2212) & (edep > PROTON_THRESHOLD)), 2))
    cpi = int(np.any((apdg == 211) & (edep > CPI_THRESHOLD)))
    npi = int(np.any((pdg == 111) & (edep > NPI_THRESHOLD)))
    return {
        "labelneutID": neut,
        "labelprotID": prot,
        "labelcpiID": cpi,
        "labelnpiID": npi,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--producer", default="sbndvoxels")
    ap.add_argument("--particle-producer", default="sbndseg")
    args = ap.parse_args()

    import h5py

    fin = h5py.File(args.input, "r")
    img = fin[f"Data/sparse3d_{args.producer}_group"]
    par = fin[f"Data/particle_{args.particle_producer}_group"]
    extents = img["extents"][:]
    vext = img["voxel_extents"][:]
    voxels = img["voxels"][:]
    p_ext = par["extents"][:]
    particles = par["particles"][:]

    writer = LarcvWriter(
        args.output, args.producer, n_projections=1, meta=META, dimension=3
    )
    kept = dropped_empty = 0
    for ev in range(len(extents)):
        vfirst, nproj = extents[ev]["first"], extents[ev]["n"]
        ids_list, val_list = [], []
        for p in range(nproj):
            vf, vn = vext[vfirst + p]["first"], vext[vfirst + p]["n"]
            vv = voxels[vf: vf + vn]
            keep = vv["value"] > THRESHOLD
            ids_list.append(vv["id"][keep])
            val_list.append(vv["value"][keep])
        ids = np.concatenate(ids_list) if ids_list else np.zeros(0, np.uint64)
        vals = (
            np.concatenate(val_list) if val_list else np.zeros(0, np.float32)
        )
        if len(ids) < MIN_VOXEL_COUNT:
            dropped_empty += 1
            continue
        pf, pn = p_ext[ev]["first"], p_ext[ev]["n"]
        pp = particles[pf: pf + pn]
        labels = event_pid_labels(
            pp["pdg"].astype(np.int64), pp["energy_deposit"]
        )
        writer.write_event(
            [(ids.astype(np.uint64), vals.astype(np.float32))],
            labels=labels,
            energy=float(pp["energy_deposit"].sum()),
        )
        kept += 1
    writer.close()
    print(
        json.dumps(
            dict(kept=kept, dropped_empty=dropped_empty, output=args.output)
        )
    )


if __name__ == "__main__":
    main()
