#!/usr/bin/env python
"""Per-label class frequencies — parity with
/root/reference/scripts/calculate_weights.py:1-19 (unique/counts of the pdg
field per label producer), against the in-repo reader.

Usage: python scripts/calculate_weights.py file.h5
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
    args = p.parse_args()

    from sparseeventid_tpu.io.larcv import LarcvDataset

    ds = LarcvDataset(args.file, args.image_key, normalize=False)
    for key, arr in ds.labels.items():
        labels, counts = np.unique(arr, return_counts=True)
        print(f"Group {key}")
        total = counts.sum()
        for lb, ct in zip(labels, counts):
            w = total / (len(labels) * ct)
            print(f"    label = {lb}, events = {ct}, weight = {w:.4f}")


if __name__ == "__main__":
    main()
