#!/usr/bin/env python
"""Data-driven WINDOW_R sizing: minimal per-(tile, offset) window spans.

For every plan type in the bench encoder (initial 5^3, series 3^3 per
level, down fwd, down rev) this computes — in pure numpy, no TPU — the
distribution over (tile, offset) pairs of the minimal window size

    R_req = max_match_pos - align16(min_match_pos) + 1

that the exact-start sorted-window kernel needs to cover every matched
pair.  The compare+staging cost of every window kernel is linear in R,
so R should sit at the smallest value whose overflow tail (pairs past
the window, handled exactly by the sidecar) stays well under the
sidecar cap (capacity//16 pairs).

Usage: python scripts/window_r_analysis.py [batch] [active_voxels]
"""

import sys

import numpy as np

GRID = (1024, 512, 1280)
MAX_VOXELS = 50000
ACTIVE = int(sys.argv[2]) if len(sys.argv) > 2 else 25000
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
TILE = 128
DEPTH = 5


def make_coords(seed):
    r = np.random.default_rng(seed)
    n_tracks = 40
    per = ACTIVE // n_tracks
    pts = []
    for t in range(n_tracks):
        start = r.uniform(0.2, 0.8, 3) * np.array(GRID)
        d = r.normal(size=3)
        d /= np.linalg.norm(d)
        steps = np.arange(per)[:, None] * d[None, :] * 2.0
        pts.append(start[None, :] + steps + r.normal(scale=0.6, size=(per, 3)))
    pts = np.concatenate(pts)
    np.clip(pts, 0, np.array(GRID) - 1, out=pts)
    return np.unique(pts.astype(np.int64), axis=0)  # unique + sorted-ish


def lin(c, grid):
    return (c[..., 0] * grid[1] + c[..., 1]) * grid[2] + c[..., 2]


def offsets(ksz):
    h = [np.arange(-(k // 2), k // 2 + 1) for k in ksz]
    return np.stack(np.meshgrid(*h, indexing="ij"), -1).reshape(-1, 3)


CAND_R = (64, 96, 128, 144, 160, 176, 224, 288, 320)


def spans_for(keys, coords, offs, grid, one_hot_col=None, ov_counts=None):
    """R_req per (tile, offset) with exact 16-aligned starts.

    ov_counts (optional dict R -> int) accumulates the number of MATCHES
    falling outside a window of size R anchored at align16(min_match) —
    i.e. the sidecar entry count this event would produce at that R."""
    n = len(keys)
    n_tiles = -(-n // TILE)
    out = []
    for kk, o in enumerate(offs):
        q = coords + o[None, :]
        ok = np.all((q >= 0) & (q < np.array(grid)), axis=-1)
        if one_hot_col is not None:
            ok &= one_hot_col == kk
        qk = lin(q, grid)
        pos = np.searchsorted(keys, qk)
        hit = ok & (pos < n)
        hit[hit] &= keys[pos[hit]] == qk[hit]
        for t in range(n_tiles):
            sl = slice(t * TILE, (t + 1) * TILE)
            p = pos[sl][hit[sl]]
            if len(p) == 0:
                continue
            start = (p.min() // 16) * 16
            out.append(p.max() - start + 1)
            if ov_counts is not None:
                for r in CAND_R:
                    ov_counts[r] += int((p >= start + r).sum())
    return np.array(out)


def coarsen(coords):
    return np.unique(coords // 2, axis=0)


def report(name, spans, caps_hint=""):
    if len(spans) == 0:
        print(f"{name:18s}  (no matches)")
        return
    qs = np.quantile(spans, [0.5, 0.9, 0.99, 0.999, 1.0])
    for r in (64, 96, 128, 176, 224, 320):
        tail = int((spans > r).sum())
        if tail == 0:
            cover = f"R={r} covers all"
            break
    else:
        cover = "R>320 needed for full cover"
    print(
        f"{name:18s}  p50={qs[0]:5.0f} p90={qs[1]:5.0f} p99={qs[2]:5.0f} "
        f"p99.9={qs[3]:5.0f} max={qs[4]:5.0f}   {cover}{caps_hint}"
    )
    for r in (64, 96, 128, 176):
        tail = int((spans > r).sum())
        if tail:
            print(f"{'':18s}  overflow(tile,offset) pairs past R={r}: {tail}"
                  f" / {len(spans)}")


def main():
    i_offs = offsets((5, 5, 5))
    s_offs = offsets((3, 3, 3))
    d_offs = np.stack(
        np.meshgrid(*([np.arange(2)] * 3), indexing="ij"), -1
    ).reshape(-1, 3)

    agg = {}
    ovagg = {}
    for b in range(BATCH):
        c0 = make_coords(b)
        level = c0
        grid = GRID
        for l in range(DEPTH + 1):
            keys = np.sort(lin(level, grid))
            order = np.argsort(lin(level, grid), kind="stable")
            coords_sorted = level[order]
            if l == 0:
                ov = {r: 0 for r in CAND_R}
                agg.setdefault("initial 5^3", []).append(
                    spans_for(keys, coords_sorted, i_offs, grid, ov_counts=ov)
                )
                ovagg.setdefault("initial 5^3", []).append(ov)
            ov = {r: 0 for r in CAND_R}
            agg.setdefault(f"series L{l} 3^3", []).append(
                spans_for(keys, coords_sorted, s_offs, grid, ov_counts=ov)
            )
            ovagg.setdefault(f"series L{l} 3^3", []).append(ov)
            if l < DEPTH:
                ngrid = tuple(-(-g // 2) for g in grid)
                coarse = np.unique(coords_sorted // 2, axis=0)
                ckeys = np.sort(lin(coarse, ngrid))
                corder = np.argsort(lin(coarse, ngrid), kind="stable")
                coarse_sorted = coarse[corder]
                # fwd: coarse queries gather fine children at stride offsets
                qc = coarse_sorted * 2
                fine_q = []
                for o in d_offs:
                    fine_q.append(lin(qc + o[None, :], grid))
                pos = np.searchsorted(keys, np.stack(fine_q, -1))
                spans = []
                n_tiles = -(-len(coarse_sorted) // TILE)
                hitm = (pos < len(keys))
                qkflat = np.stack(fine_q, -1)
                hitm[hitm] &= keys[np.clip(pos, 0, len(keys) - 1)][hitm] == qkflat[hitm]
                for kk in range(8):
                    for t in range(n_tiles):
                        sl = slice(t * TILE, (t + 1) * TILE)
                        p = pos[sl, kk][hitm[sl, kk]]
                        if len(p):
                            spans.append(p.max() - (p.min() // 16) * 16 + 1)
                agg.setdefault(f"down_f L{l}", []).append(np.array(spans))
                # rev: fine queries gather their single coarse parent
                parent = coords_sorted // 2
                rem = coords_sorted - parent * 2
                colid = (rem[:, 0] * 2 + rem[:, 1]) * 2 + rem[:, 2]
                agg.setdefault(f"down_r L{l}", []).append(
                    spans_for(
                        ckeys, parent * 2, d_offs * 0, ngrid,
                        one_hot_col=None,
                    ) if False else
                    _rev_spans(ckeys, parent, colid, ngrid)
                )
                level = coarse_sorted
                grid = ngrid

    print(f"bench-like data: batch {BATCH}, ~{ACTIVE} active, grid {GRID}")
    print(f"(current constants: WINDOW_R=176, WINDOW_R_STRIDED=320)\n")
    for name in sorted(agg):
        report(name, np.concatenate(agg[name]))
        if name in ovagg:
            per_r = {
                r: max(d[r] for d in ovagg[name]) for r in CAND_R
            }
            line = "  ".join(
                f"R{r}:{v}" for r, v in per_r.items() if v or r <= 176
            )
            print(f"{'':18s}  max sidecar entries/event: {line}")


def _rev_spans(ckeys, parent, colid, ngrid):
    """Reverse plan: each fine row queries its parent in its offset column."""
    pk = lin(parent, ngrid)
    pos = np.searchsorted(ckeys, pk)
    hit = pos < len(ckeys)
    hit[hit] &= ckeys[pos[hit]] == pk[hit]
    n_tiles = -(-len(parent) // TILE)
    out = []
    for kk in range(8):
        m = colid == kk
        for t in range(n_tiles):
            sl = slice(t * TILE, (t + 1) * TILE)
            sel = m[sl] & hit[sl]
            p = pos[sl][sel]
            if len(p):
                out.append(p.max() - (p.min() // 16) * 16 + 1)
    return np.array(out)


if __name__ == "__main__":
    main()
