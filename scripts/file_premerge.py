#!/usr/bin/env python
"""Pre-merge larcv3-schema HDF5 files in fixed-size chunks — parity with
/root/reference/scripts/file_premerge.py (chunks of 8 files merged into
`<outname>_chunk8_<i>.h5`, :12-33), implemented over the in-repo
reader/writer instead of shelling out to larcv's merge_larcv3_files.py.
Events keep their file order (no shuffle, no split — that is
file_merge.py's job downstream).

Usage:
    python scripts/file_premerge.py out_prefix in1.h5 in2.h5 ... \
        [--chunk-size 8] [--image-key dunevoxels] [--dimension 3]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def premerge(inputs, out_prefix, chunk_size=8, image_key="dunevoxels",
             dimension=3):
    from sparseeventid_tpu.io.larcv import LarcvDataset, LarcvWriter

    written = []
    for i in range(0, len(inputs), chunk_size):
        chunk = inputs[i:i + chunk_size]
        out = Path(f"{out_prefix}_chunk{chunk_size}_{i // chunk_size}.h5")
        print(f"Merging {len(chunk)} files from {i} to {i + len(chunk)}"
              f" -> {out}")
        datasets = [
            LarcvDataset(f, image_key, dimension=dimension,
                         normalize=False, max_voxels=10**9)
            for f in chunk
        ]
        writer = LarcvWriter(
            out, image_key, datasets[0].n_projections, datasets[0].meta,
            dimension=dimension,
        )
        for ds in datasets:
            for e_i in range(len(ds)):
                projections = [
                    (ids.astype(np.uint64), vals)
                    for ids, vals in ds._event_voxels(e_i)
                ]
                labels = {k: int(v[e_i]) for k, v in ds.labels.items()}
                energy = (
                    float(ds.energy[e_i]) if ds.energy is not None else 0.0
                )
                writer.write_event(
                    projections, labels=labels or None, energy=energy
                )
        writer.close()
        written.append(out)
    return written


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_prefix")
    p.add_argument("inputs", nargs="+")
    p.add_argument("--chunk-size", type=int, default=8)
    p.add_argument("--image-key", default="dunevoxels")
    p.add_argument("--dimension", type=int, default=3)
    args = p.parse_args()
    premerge(args.inputs, args.out_prefix, args.chunk_size,
             args.image_key, args.dimension)


if __name__ == "__main__":
    main()
