#!/usr/bin/env python
"""Merge larcv3-schema HDF5 files into train/test splits — parity with
/root/reference/scripts/file_merge.py + file_premerge.py (80/20 split at
:12-21), implemented with the in-repo reader/writer instead of shelling out
to larcv's merge binaries.

Usage:
    python scripts/file_merge.py out_dir in1.h5 in2.h5 ... \
        [--image-key dunevoxels] [--train-fraction 0.8] [--seed 0]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("inputs", nargs="+")
    p.add_argument("--image-key", default="dunevoxels")
    p.add_argument("--dimension", type=int, default=3)
    p.add_argument("--train-fraction", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from sparseeventid_tpu.io.larcv import LarcvDataset, LarcvWriter

    datasets = [
        LarcvDataset(f, args.image_key, dimension=args.dimension,
                     normalize=False, max_voxels=10**9)
        for f in args.inputs
    ]
    events = [(d_i, e_i) for d_i, d in enumerate(datasets) for e_i in range(len(d))]
    rng = np.random.default_rng(args.seed)
    rng.shuffle(events)
    n_train = int(len(events) * args.train_fraction)
    splits = {"train": events[:n_train], "test": events[n_train:]}

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    meta = datasets[0].meta
    for split, evs in splits.items():
        writer = LarcvWriter(
            out_dir / f"{split}.h5", args.image_key,
            datasets[0].n_projections, meta, dimension=args.dimension,
        )
        for d_i, e_i in evs:
            ds = datasets[d_i]
            projections = [
                (ids.astype(np.uint64), vals)
                for ids, vals in ds._event_voxels(e_i)
            ]
            labels = {k: int(v[e_i]) for k, v in ds.labels.items()}
            energy = float(ds.energy[e_i]) if ds.energy is not None else 0.0
            writer.write_event(projections, labels=labels or None, energy=energy)
        writer.close()
        print(f"{split}: {len(evs)} events -> {out_dir / (split + '.h5')}")


if __name__ == "__main__":
    main()
