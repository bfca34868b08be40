#!/usr/bin/env python
"""Active-voxel occupancy statistics — parity with
/root/reference/scripts/voxel_occupancy.py:7-66 (mean/rms/max voxel counts
per plane), used to size the static capacity schedule (SURVEY.md §7.4).

Usage: python scripts/voxel_occupancy.py file.h5
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("file")
    p.add_argument("--image-key", default="dunevoxels")
    p.add_argument("--dimension", type=int, default=3)
    args = p.parse_args()

    from sparseeventid_tpu.io.larcv import LarcvDataset

    ds = LarcvDataset(
        args.file, args.image_key, dimension=args.dimension,
        normalize=False, max_voxels=10**9,
    )
    counts = np.zeros((len(ds), ds.n_projections))
    for i in range(len(ds)):
        for pi, (ids, _) in enumerate(ds._event_voxels(i)):
            counts[i, pi] = len(ids)
    print("Average voxel occupation:")
    for pi in range(ds.n_projections):
        c = counts[:, pi]
        print(
            f"  plane {pi}: {c.mean():.2f} +/- {c.std():.2f} "
            f"({int(c.max())} max, p99 {np.percentile(c, 99):.0f})"
        )
    print(
        "suggested capacity (p99.5 rounded up to 1024):",
        int(-(-np.percentile(counts.sum(axis=1), 99.5) // 1024) * 1024),
    )


if __name__ == "__main__":
    main()
