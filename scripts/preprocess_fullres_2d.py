#!/usr/bin/env python
"""Detector preprocessing (2D twin of preprocess_fullres_3d.py): raw
simulation file -> training-ready labeled sparse 2D multiplane tensors —
the role of the reference's larcv3 ProcessDriver config
(/root/reference/larcv_scripts/preprocess_fullres_2D.cfg:1-60),
re-implemented against the in-repo reader/writer instead of the larcv3
C++ processes:

  * Threshold           (value > 0.01, Cluster2DThreshold)
  * EmptyTensorFilter   (MinVoxel2DCount = 25)
  * CompressAndEmbed    (embed each plane into 2048 rows x 1280 cols,
                         Row/ColCompression = 1 -> pure embed: voxel ids
                         are re-linearized from the input grid into the
                         output grid, image centered)
  * EventPIDLabel       (proton 20 MeV / charged pion 10 MeV / neutral
                         pion 0 MeV -> neutID/protID/cpiID/npiID labels)
  * TensorFromCluster2D (voxel ids pass through: the raw file already
                         holds linearized voxel ids per plane)

Input schema: ``Data/sparse2d_<producer>_group`` voxels (one projection
per wire plane) + ``Data/particle_<producer>_group`` with the FULL
per-event particle list.  Output: the training schema written by
io/larcv.py's LarcvWriter (3 projections + 4 label producers + 'event').

Usage:
  python scripts/preprocess_fullres_2d.py raw.h5 out.h5 \
      --producer sbndvoxels --particle-producer sbndseg \
      --input-rows 2048 --input-cols 1280
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sparseeventid_tpu.io.larcv import LarcvWriter  # noqa: E402
from scripts.preprocess_fullres_3d import event_pid_labels  # noqa: E402

# preprocess_fullres_2D.cfg ProcessList parameters
THRESHOLD = 0.01
MIN_VOXEL_COUNT = 25
OUT_ROWS = 2048
OUT_COLS = 1280
N_PLANES = 3


def embed_ids(
    ids: np.ndarray, in_rows: int, in_cols: int
) -> tuple[np.ndarray, np.ndarray]:
    """CompressAndEmbed Mode=0 with compression 1: re-linearize voxel ids
    from the (in_rows, in_cols) grid into the centered (OUT_ROWS,
    OUT_COLS) grid.  Returns (new_ids, in_bounds_mask)."""
    row = (ids // in_cols).astype(np.int64)
    col = (ids % in_cols).astype(np.int64)
    row = row + (OUT_ROWS - in_rows) // 2
    col = col + (OUT_COLS - in_cols) // 2
    ok = (row >= 0) & (row < OUT_ROWS) & (col >= 0) & (col < OUT_COLS)
    return (row * OUT_COLS + col).astype(np.uint64), ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--producer", default="sbndvoxels")
    ap.add_argument("--particle-producer", default="sbndseg")
    ap.add_argument("--input-rows", type=int, default=OUT_ROWS)
    ap.add_argument("--input-cols", type=int, default=OUT_COLS)
    args = ap.parse_args()

    import h5py

    fin = h5py.File(args.input, "r")
    img = fin[f"Data/sparse2d_{args.producer}_group"]
    par = fin[f"Data/particle_{args.particle_producer}_group"]
    extents = img["extents"][:]
    vext = img["voxel_extents"][:]
    voxels = img["voxels"][:]
    p_ext = par["extents"][:]
    particles = par["particles"][:]

    writer = LarcvWriter(
        args.output,
        args.producer,
        n_projections=N_PLANES,
        meta=dict(n_voxels=[N_PLANES, OUT_ROWS, OUT_COLS]),
        dimension=2,
    )
    kept = dropped_empty = 0
    for ev in range(len(extents)):
        vfirst, nproj = extents[ev]["first"], extents[ev]["n"]
        planes, total = [], 0
        for p in range(min(nproj, N_PLANES)):
            vf, vn = vext[vfirst + p]["first"], vext[vfirst + p]["n"]
            vv = voxels[vf : vf + vn]
            keep = vv["value"] > THRESHOLD
            ids, ok = embed_ids(
                vv["id"][keep], args.input_rows, args.input_cols
            )
            planes.append(
                (ids[ok], vv["value"][keep][ok].astype(np.float32))
            )
            total += int(ok.sum())
        while len(planes) < N_PLANES:
            planes.append(
                (np.zeros(0, np.uint64), np.zeros(0, np.float32))
            )
        if total < MIN_VOXEL_COUNT:
            dropped_empty += 1
            continue
        pf, pn = p_ext[ev]["first"], p_ext[ev]["n"]
        pp = particles[pf : pf + pn]
        labels = event_pid_labels(
            pp["pdg"].astype(np.int64), pp["energy_deposit"]
        )
        writer.write_event(
            planes, labels=labels, energy=float(pp["energy_deposit"].sum())
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
