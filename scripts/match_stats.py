#!/usr/bin/env python
"""Match-structure statistics for the window-conv formulation study.

For each encoder level's series conv (3^3, K=27) and the initial 5^3 conv
(K=125), measures on bench-shaped track batches:

  * degree   — matched (in,out) pairs per live query row (= how much of the
               K-offset loop is real work).  The window kernels pay K*R per
               query regardless; a pair/compacted formulation pays ~degree.
  * S_tile   — per 128-query tile, the number of offsets with >= 1 match
               (p50/p90/p99/max).  An offset-compacted kernel stages/dots
               only those.
  * in-span  — per (tile, offset) with >= 1 match, the span of matching
               TABLE rows (current R must cover ~p99; listed for reference).

Pure numpy on the same site pyramid the host builder produces.  CPU-only.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from sparseeventid_tpu.models.encoder import capacity_schedule
from sparseeventid_tpu.ops.rulebook import kernel_offsets

GRID = (1024, 512, 1280)
MAX_VOXELS = 50000
BATCH = 8
DEPTH = 5
TILE = 128


def make_coords(seed, active=25000):
    r = np.random.default_rng(seed)
    out = []
    for b in range(BATCH):
        per = active // 40
        pts = []
        for t in range(40):
            start = r.uniform(0.2, 0.8, 3) * np.array(GRID)
            d = r.normal(size=3)
            d /= np.linalg.norm(d)
            steps = np.arange(per)[:, None] * d[None, :] * 2.0
            pts.append(start[None, :] + steps
                       + r.normal(scale=0.6, size=(per, 3)))
        pts = np.concatenate(pts)
        np.clip(pts, 0, np.array(GRID) - 1, out=pts)
        c = np.unique(pts.astype(np.int64), axis=0)
        out.append(c[:MAX_VOXELS])
    return out


def lin(c, grid):
    return (c[:, 0] * grid[1] + c[:, 1]) * grid[2] + c[:, 2]


def stats_for(coords, grid, offs, label):
    """coords: list of [n, 3] per event (sorted unique)."""
    degs, s_tiles, spans, dead_frac = [], [], [], []
    for c in coords:
        keys = np.sort(lin(c, grid))
        n = len(keys)
        n_tiles = -(-n // TILE)
        hit_any = np.zeros((n_tiles, len(offs)), bool)
        total_pairs = 0
        for kk, off in enumerate(offs):
            q = c + np.asarray(off)[None, :]
            valid = np.all((q >= 0) & (q < np.asarray(grid)[None, :]), axis=1)
            qk = lin(q, grid)
            pos = np.searchsorted(keys, qk)
            pos_c = np.minimum(pos, n - 1)
            hit = valid & (keys[pos_c] == qk)
            total_pairs += int(hit.sum())
            # per-tile occupancy + span of matching table rows
            for t in range(n_tiles):
                h = hit[t * TILE:(t + 1) * TILE]
                if h.any():
                    hit_any[t, kk] = True
                    p = pos_c[t * TILE:(t + 1) * TILE][h]
                    spans.append(int(p.max() - p.min() + 1))
        degs.append(total_pairs / n)
        s_tiles.extend(hit_any.sum(axis=1).tolist())
        dead_frac.append(1.0 - hit_any.mean())
    s = np.array(s_tiles)
    sp = np.array(spans) if spans else np.array([0])
    print(f"{label:14s} deg {np.mean(degs):6.2f}/{len(offs)}   "
          f"S_tile p50 {np.percentile(s, 50):5.1f} p90 "
          f"{np.percentile(s, 90):5.1f} p99 {np.percentile(s, 99):5.1f} "
          f"max {s.max():3d}   dead(tile,k) {np.mean(dead_frac) * 100:4.1f}%"
          f"   span p50 {np.percentile(sp, 50):4.0f} p99 "
          f"{np.percentile(sp, 99):4.0f}")


def main():
    active = int(sys.argv[1]) if len(sys.argv) > 1 else 25000
    events = make_coords(0, active)
    offs3 = np.asarray(kernel_offsets((3, 3, 3), centered=True))
    offs5 = np.asarray(kernel_offsets((5, 5, 5), centered=True))
    print(f"bench-shaped tracks, {active} active/event, batch {BATCH}")
    stats_for(events, GRID, offs5, "initial 5^3")
    grid = GRID
    coords = events
    for l in range(DEPTH + 1):
        stats_for(coords, grid, offs3, f"lvl{l} series")
        if l == DEPTH:
            break
        # strided downsample: unique(coords // 2) in the halved grid
        grid = tuple(-(-g // 2) for g in grid)
        coords = [np.unique(c // 2, axis=0) for c in coords]


if __name__ == "__main__":
    main()
