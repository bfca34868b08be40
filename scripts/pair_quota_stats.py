#!/usr/bin/env python
"""Per-(tile, offset) match-count statistics for the HYBRID conv design
(round 4): split kernel offsets into a DENSE class (matched by most queries
of a tile -> the windowed one-hot form is near-optimal) and a SPARSE class
(few matches/tile -> quota-compacted pair slots shrink the one-hot).

For each level this measures, on bench-shaped track batches:
  * per-OFFSET per-tile match counts (p50/p99/max over live tiles), sorted
    — the dense/sparse split point and the sparse quota Q follow;
  * the UNION window span per tile over a candidate sparse class (the
    pair-gather window R_u must cover it);
  * spill: pairs beyond quota Q or outside R_u (must fit the sidecar);
  * a cycle-model comparison of current wfuse vs the hybrid kernel.

Pure numpy on the same site pyramid the host builder produces.  CPU-only.
Usage: pair_quota_stats.py [active_per_event] [n_dense]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

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


def level_match_data(coords, grid, offs):
    """-> list over events of (n, counts[tiles, K], pos[n, K] (match row or
    -1))."""
    out = []
    g = np.asarray(grid)
    for c in coords:
        keys = np.sort(lin(c, grid))
        n = len(keys)
        n_tiles = -(-n // TILE)
        pos_all = np.full((n_tiles * TILE, len(offs)), -1, np.int64)
        for kk, off in enumerate(offs):
            q = c + np.asarray(off)[None, :]
            valid = np.all((q >= 0) & (q < g[None, :]), axis=1)
            qk = lin(q, grid)
            p = np.searchsorted(keys, qk)
            p_c = np.minimum(p, n - 1)
            hit = valid & (keys[p_c] == qk)
            pos_all[:n, kk] = np.where(hit, p_c, -1)
        counts = (pos_all.reshape(n_tiles, TILE, -1) >= 0).sum(axis=1)
        out.append((n, counts, pos_all))
    return out


def analyze(label, data, offs, n_dense, quota):
    k = len(offs)
    all_counts = np.concatenate([d[1] for d in data], axis=0)  # [tiles, K]
    live = all_counts.sum(axis=1) > 0
    ac = all_counts[live]
    per_off_p50 = np.percentile(ac, 50, axis=0)
    per_off_p99 = np.percentile(ac, 99, axis=0)
    per_off_max = ac.max(axis=0)
    order = np.argsort(-per_off_p50)  # densest first
    dense = order[:n_dense]
    sparse = order[n_dense:]
    # quota spill for sparse offsets
    spill = np.maximum(ac[:, sparse] - quota, 0).sum()
    total_sparse_pairs = ac[:, sparse].sum()
    total_pairs = ac.sum()
    # union span per tile over sparse-class matches
    spans = []
    for n, counts, pos in data:
        n_tiles = -(-n // TILE)
        ps = pos[:, sparse].reshape(n_tiles, TILE * len(sparse))
        for t in range(n_tiles):
            row = ps[t]
            row = row[row >= 0]
            if len(row):
                spans.append(int(row.max() - row.min() + 1))
    spans = np.array(spans) if spans else np.array([0])
    # also union span ANCHORED at a 16-aligned start: add alignment slack 16
    print(f"\n== {label} (K={k}) ==")
    names = [
        f"{tuple(offs[i])}: p50 {per_off_p50[i]:5.1f} p99 "
        f"{per_off_p99[i]:5.1f} max {per_off_max[i]:3.0f}"
        for i in order
    ]
    for row in names[: min(8, k)]:
        print("  dense? ", row)
    print("  ... sparse tail p50s:",
          np.round(per_off_p50[order[n_dense:]], 1).tolist())
    print(f"  dense set ({n_dense}): {[tuple(offs[i]) for i in dense]}")
    print(f"  sparse pairs {total_sparse_pairs}/{total_pairs} "
          f"({100.0 * total_sparse_pairs / max(total_pairs, 1):.1f}%) | "
          f"quota Q={quota} spill {spill} "
          f"({100.0 * spill / max(total_sparse_pairs, 1):.2f}% of sparse)")
    print(f"  sparse-union span p50 {np.percentile(spans, 50):5.0f} "
          f"p90 {np.percentile(spans, 90):5.0f} "
          f"p99 {np.percentile(spans, 99):5.0f} max {spans.max():5.0f}")
    # per-tile spill (sidecar feasibility): entries per batch-elem
    spill_per_tile = np.maximum(ac[:, sparse] - quota, 0).sum(axis=1)
    print(f"  spill/tile p99 {np.percentile(spill_per_tile, 99):.1f} "
          f"max {spill_per_tile.max():.0f}; "
          f"tiles with spill {100.0 * (spill_per_tile > 0).mean():.1f}%")
    return dense, sparse


def cycle_model(k, n_dense, quota, r_dense, r_u, c, co, t=TILE):
    """Rough v5e per-tile cycle model: VPU 4096 lanes/cyc, MXU ~100k MAC/cyc."""
    VPU, MXU = 4096.0, 100e3
    ks = k - n_dense - 1  # sparse offsets (center handled as identity)
    kq = ks * quota
    # current wfuse: K stagings + K compares [R,T] + premul K*R*C*CO + big dot K*R*T*CO... wait big dot is T x (K*R) x CO
    cur = (
        k * r_dense * t / VPU  # compares
        + 2 * k * r_dense * c / VPU  # staging copies (load+store)
        + (k * r_dense * c * co + t * k * r_dense * co) / MXU  # wfuse dots
    )
    hyb = (
        (n_dense * r_dense * t + kq * r_u + kq * t) / VPU  # compares
        + 2 * (n_dense * r_dense * c + r_u * c) / VPU  # staging
        + (n_dense * r_dense * c * co + t * n_dense * r_dense * co  # dense dots
           + r_u * kq * c  # sparse gather dot
           + kq * c * co  # per-k premul
           + kq * t * co  # scatter dot
           + t * c * co  # center identity
           ) / MXU
    )
    print(f"  cycle model/tile: current ~{cur:5.0f} vs hybrid ~{hyb:5.0f} "
          f"({cur / hyb:.2f}x)")


def main():
    active = int(sys.argv[1]) if len(sys.argv) > 1 else 25000
    n_dense = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    quota = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    events = make_coords(0, active)
    offs3 = np.asarray(kernel_offsets((3, 3, 3), centered=True))
    offs5 = np.asarray(kernel_offsets((5, 5, 5), centered=True))
    print(f"bench-shaped tracks, {active} active/event, batch {BATCH}, "
          f"n_dense {n_dense}, quota {quota}")
    data5 = level_match_data(events, GRID, offs5)
    analyze("initial 5^3", data5, offs5, n_dense, quota)
    cycle_model(125, n_dense, quota, 176, 320, 1, 32)
    grid = GRID
    coords = events
    for l in range(DEPTH + 1):
        data = level_match_data(coords, grid, offs3)
        analyze(f"lvl{l} series", data, offs3, n_dense, quota)
        cycle_model(27, n_dense, quota, 144 if l < 3 else 160, 288, 32, 32)
        if l == DEPTH:
            break
        grid = tuple(-(-g // 2) for g in grid)
        coords = [np.unique(c // 2, axis=0) for c in coords]


if __name__ == "__main__":
    main()
