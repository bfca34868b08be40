#!/usr/bin/env python
"""Measure exact-start window span statistics per pyramid level.

For each level of the dune3d-shaped site pyramid, and for each (tile, offset):
  span = max(match_pos) - min(match_pos) over the tile's valid queries,
where match_pos is the exact sorted-table position of each query key.
This tells us the minimal static WINDOW_R required when window starts are
exact (searchsorted of the tile's min query) instead of anchor-quantized
(the round-1 design forced R = 2*ANCHOR_A = 256).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GRID = (1024, 512, 1280)
MAX_VOXELS = 50000
ACTIVE_VOXELS = 25000
BATCH = 8
TILE_T = 128


def make_event_coords(r, grid, n, n_tracks=40):
    per = n // n_tracks
    pts = []
    for t in range(n_tracks):
        start = r.uniform(0.2, 0.8, 3) * np.array(grid)
        d = r.normal(size=3)
        d /= np.linalg.norm(d)
        steps = np.arange(per)[:, None] * d[None, :] * 2.0
        pts.append(start[None, :] + steps + r.normal(scale=0.6, size=(per, 3)))
    pts = np.concatenate(pts)
    np.clip(pts, 0, np.array(grid) - 1, out=pts)
    return np.unique(pts.astype(np.int64), axis=0)


def linearize(c, grid):
    return (c[..., 0] * grid[1] + c[..., 1]) * grid[2] + c[..., 2]


def offsets3(k):
    r = np.arange(k) - k // 2
    return np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)


def analyze_level(coords, grid, ksize, label):
    """coords: [n,3] sorted-unique. Report per-(tile,offset) spans."""
    keys = np.sort(linearize(coords, grid))
    n = len(keys)
    offs = offsets3(ksize)
    spans_all = []
    shift_all = []
    for off in offs:
        q = coords + off
        ok = np.all((q >= 0) & (q < np.array(grid)), axis=1)
        qk = linearize(q, grid)
        # exact match position: searchsorted; only matched queries matter
        # (unmatched go nowhere; but WINDOW must cover matched ones).
        pos = np.searchsorted(keys, qk)
        matched = ok & (pos < n) & (keys[np.minimum(pos, n - 1)] == qk)
        n_tiles = -(-n // TILE_T)
        for t in range(n_tiles):
            sl = slice(t * TILE_T, (t + 1) * TILE_T)
            m = matched[sl]
            if not m.any():
                continue
            p = pos[sl][m]
            spans_all.append(p.max() - p.min() + 1)
            shift_all.append(p.min() - t * TILE_T)
    spans = np.array(spans_all)
    if len(spans) == 0:
        print(f"{label}: no matches")
        return
    qs = np.percentile(spans, [50, 90, 99, 99.9])
    frac = {R: float((spans > R).mean()) for R in (64, 96, 128, 160, 192, 256)}
    print(
        f"{label}: n={n} tiles*offs={len(spans)} span p50={qs[0]:.0f} "
        f"p90={qs[1]:.0f} p99={qs[2]:.0f} p99.9={qs[3]:.0f} max={spans.max()} "
        f"| frac_tiles_overflowing R: "
        + " ".join(f"{R}:{frac[R]:.4f}" for R in sorted(frac))
    )
    # out-of-window PAIR rate for candidate Rs with exact aligned starts
    # (start = round_down(minpos, 8), window [start, start+R))
    for R in (96, 128, 160, 192):
        lost = 0
        total = 0
        for off in offs:
            q = coords + off
            ok = np.all((q >= 0) & (q < np.array(grid)), axis=1)
            qk = linearize(q, grid)
            pos = np.searchsorted(keys, qk)
            matched = ok & (pos < n) & (keys[np.minimum(pos, n - 1)] == qk)
            n_tiles = -(-n // TILE_T)
            for t in range(n_tiles):
                sl = slice(t * TILE_T, (t + 1) * TILE_T)
                m = matched[sl]
                if not m.any():
                    continue
                p = pos[sl][m]
                start = (p.min() // 8) * 8
                lost += int((p >= start + R).sum())
                total += int(m.sum())
        print(f"  R={R}: pair overflow rate {lost}/{total} = {lost/total:.5f}")


def downsample(coords):
    return np.unique(coords // 2, axis=0)


def main():
    r = np.random.default_rng(0)
    coords = make_event_coords(r, GRID, ACTIVE_VOXELS)
    grid = list(GRID)
    for level in range(6):
        analyze_level(np.array(sorted(map(tuple, coords))), tuple(grid), 3,
                      f"level {level} (k=3)")
        if level == 0:
            analyze_level(np.array(sorted(map(tuple, coords))), tuple(grid), 5,
                          f"level {level} (k=5)")
        coords = downsample(coords)
        grid = [max(1, g // 2) for g in grid]


if __name__ == "__main__":
    main()
