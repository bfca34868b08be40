#!/usr/bin/env python
"""Exact sidecar occupancy at candidate WINDOW_R values.

Runs the native host plan builder (the production path) on bench-shaped
track batches and reports, per plan, the max valid-entry count and
ov_dropped across events — the ground truth for whether a (window_r,
ov_cap) pair is exactness-safe on this distribution (window_r_analysis.py
approximates this from match spans only; the sidecar also holds unmatched
candidates whose anchor block escaped the plan window).

CPU-only. Usage: python scripts/ov_occupancy.py [R_series] [R_initial]
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from sparseeventid_tpu.io.hostio import build_window_plans
from sparseeventid_tpu.models.encoder import capacity_schedule
from sparseeventid_tpu.ops import engine as _eng
from sparseeventid_tpu.ops.pallas.window_conv import WINDOW_R_STRIDED

GRID = (1024, 512, 1280)
MAX_VOXELS = 50000
BATCH = 8
DEPTH = 5


def make_coords(seed, active=25000):
    r = np.random.default_rng(seed)
    coords = np.full((BATCH, MAX_VOXELS, 3), -1, np.int32)
    for b in range(BATCH):
        per = active // 40
        pts = []
        for t in range(40):
            start = r.uniform(0.2, 0.8, 3) * np.array(GRID)
            d = r.normal(size=3)
            d /= np.linalg.norm(d)
            steps = np.arange(per)[:, None] * d[None, :] * 2.0
            pts.append(start[None, :] + steps + r.normal(scale=0.6, size=(per, 3)))
        pts = np.concatenate(pts)
        np.clip(pts, 0, np.array(GRID) - 1, out=pts)
        c = np.unique(pts.astype(np.int32), axis=0)
        k = min(len(c), MAX_VOXELS)
        coords[b, :k] = c[:k]
    return coords


def main():
    r_series = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    r_initial = int(sys.argv[2]) if len(sys.argv) > 2 else r_series
    r_deep = int(sys.argv[3]) if len(sys.argv) > 3 else r_series
    deep_from = int(os.environ.get("SEID_WINDOW_R_DEEP_FROM", "2"))
    wr_series = [r_series if l < deep_from else r_deep
                 for l in range(DEPTH + 1)]
    caps = capacity_schedule(MAX_VOXELS, DEPTH, 0.5, 256)
    names = (
        ["initial"]
        + [f"lvl{l}/series" for l in range(DEPTH + 1)]
        + [f"lvl{l}/down_f" for l in range(DEPTH)]
        + [f"lvl{l}/down_r" for l in range(DEPTH)]
    )
    worst = {n: (0, 0, 0) for n in names}  # (max_valid, cap, max_dropped)
    for seed in range(4):
        host = build_window_plans(
            make_coords(seed), GRID, list(caps),
            initial_kernel=(5, 5, 5), series_kernel=(3, 3, 3),
            stride=(2, 2, 2), window_r=r_series,
            ov_caps=[_eng._overflow_cap(c, 27) for c in caps],
            ov_cap_initial=_eng._overflow_cap(caps[0], 125),
            ov_caps_down=[_eng._overflow_cap(c, 8) for c in caps[:-1]],
            window_r_down=WINDOW_R_STRIDED,
            window_r_initial=r_initial,
            window_r_series=wr_series,
        )
        for n in names:
            v = int(np.max(np.sum(host[f"{n}/ov_valid"], axis=1)))
            cap = host[f"{n}/ov_valid"].shape[1]
            d = int(np.max(host[f"{n}/ov_dropped"]))
            mv, _, md = worst[n]
            worst[n] = (max(mv, v), cap, max(md, d))
    print(f"R_series={wr_series} R_initial={r_initial} "
          f"(4 seeds x {BATCH} events, caps=capacity//8)")
    ok = True
    for n in names:
        v, cap, d = worst[n]
        flag = "  OVER" if d > 0 else ("  tight" if v > 0.7 * cap else "")
        if d > 0:
            ok = False
        print(f"  {n:16s} max_valid {v:6d} / cap {cap:6d}"
              f"   max_dropped {d:6d}{flag}")
    print("SAFE" if ok else "UNSAFE: dropped pairs — raise cap or R")


if __name__ == "__main__":
    main()
