#!/usr/bin/env python
"""Round-4 second-generation formulation bake-off (VERDICT r3 task #1).

The r3/r4 studies put the sorted-window one-hot engine within ~25-30% of
its architectural floor (PERF_NOTES r4: 31 MXU passes/tile irreducible,
measured 2.23 ms/conv vs 1.7 ms dot floor at L0 bench geometry).  The
VERDICT asked for the two remaining candidate FORMULATIONS to be
prototyped and baked off in-chain rather than closed by argument:

  (a) occupied-brick decomposition — pack active voxels into occupied
      b^3 bricks, halo-gather the 26 neighbor bricks, run DENSE conv per
      brick (im2col GEMM out[b^3, CO] = halo[b^3, 27C] @ W[27C, CO]),
      mask outputs to submanifold sites.  Candidate rationale (VERDICT):
      the window dots are overhead-bound, so ~10x FLOP dilation could
      still win by deleting the compare+skeleton machinery.
  (b) host-exact pair lists + DMA-pipelined row gather — the C++ builder
      already computes exact (src, dst) matches; emit per-offset pair
      lists sorted by output tile and stage source rows by async
      row-block DMA (8-row blocks, the Mosaic-alignable unit), then a
      compacted select-dot + per-offset weight GEMMs.

This probe measures each candidate at its FLOOR — the irreducible MXU
work it would do with ALL data movement free (no halo gather, no DMA
issue cost, no masking, no scatter) — in-chain (N=1 vs N=8 slope, the
calibrated method from scripts/chain_probe.py) on the same bench-shaped
data as the production window conv baseline measured in the same
process.  If a candidate's floor already loses to the production
kernel's TOTAL, the formulation is closed by measurement.

Part 1 (CPU, --host-only): structural statistics that size each
candidate on bench-shaped tracks (batch 8, 25k active/event, L0 3^3):
brick occupancy/dilation/halo for b in {4, 8}; per-(tile, offset) pair
counts, distinct 8-row DMA blocks, and per-tile staged-row totals vs
the window engine's R=144.

Part 2 (TPU): chained floor GEMMs sized by part 1 + the production
window conv (window_conv_apply) on identical data.

Reference contract this competes with: scn's hash-rulebook gather-GEMM
(/root/reference/src/networks/sparse_building_blocks.py:29).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

B = 8
ACTIVE = 25000
CAP = 25600
C = 32
CO = 32
K = 27
GRID = (1024, 512, 1280)
TILE = 128
R = 144  # production window rows (L0 series)


def make_coords(seed=0, active=ACTIVE):
    """Same bench-shaped track generator as scripts/match_stats.py."""
    r = np.random.default_rng(seed)
    out = []
    for b in range(B):
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
        out.append(np.unique(pts.astype(np.int64), axis=0)[:CAP])
    return out


def lin(c, grid):
    return (c[:, 0] * grid[1] + c[:, 1]) * grid[2] + c[:, 2]


# ---------------------------------------------------------------- part 1
def brick_stats(events, b):
    """Occupied-brick structure for brick edge b."""
    occ, nbr, nbricks, dil = [], [], [], []
    shifts = [np.array(s) for s in np.ndindex(3, 3, 3)]
    for c in events:
        bid = c // b
        ub, counts = np.unique(bid, axis=0, return_counts=True)
        occ.extend(counts.tolist())
        nbricks.append(len(ub))
        dil.append(len(ub) * b ** 3 / len(c))
        bset = set(map(tuple, ub))
        # occupied halo neighbors per brick (26-neighborhood)
        hn = [
            sum(
                (tuple(u + s - 1) in bset)
                for s in shifts
                if not np.all(s == 1)
            )
            for u in ub
        ]
        nbr.extend(hn)
    occ = np.array(occ)
    print(
        f"brick b={b}: bricks/event {np.mean(nbricks):7.0f}  "
        f"occupancy mean {occ.mean():5.2f} p50 {np.percentile(occ, 50):3.0f} "
        f"p90 {np.percentile(occ, 90):3.0f}  dilation x{np.mean(dil):5.2f}  "
        f"occupied-neighbors mean {np.mean(nbr):5.2f}/26"
    )
    return int(np.mean(nbricks)), float(np.mean(dil))


def pair_dma_stats(events, offs):
    """Pair-list + 8-row-block DMA structure at L0 3^3."""
    pairs_tile, blocks_sum, blocks_union, rows_union = [], [], [], []
    for c in events:
        keys = lin(c, GRID)
        order = np.argsort(keys)
        keys = keys[order]
        cs = c[order]
        n = len(keys)
        n_tiles = -(-n // TILE)
        per_tile_blocks = [set() for _ in range(n_tiles)]
        per_tile_sum = np.zeros(n_tiles, int)
        per_tile_pairs = np.zeros(n_tiles, int)
        for off in offs:
            q = cs + np.asarray(off)[None, :]
            valid = np.all(
                (q >= 0) & (q < np.asarray(GRID)[None, :]), axis=1
            )
            qk = lin(q, GRID)
            pos = np.searchsorted(keys, qk)
            pos_c = np.minimum(pos, n - 1)
            hit = valid & (keys[pos_c] == qk)
            for t in range(n_tiles):
                h = hit[t * TILE:(t + 1) * TILE]
                if not h.any():
                    continue
                p = pos_c[t * TILE:(t + 1) * TILE][h]
                blk = np.unique(p // 8)
                per_tile_sum[t] += len(blk)
                per_tile_blocks[t].update(blk.tolist())
                per_tile_pairs[t] += int(h.sum())
        pairs_tile.extend(per_tile_pairs.tolist())
        blocks_sum.extend(per_tile_sum.tolist())
        blocks_union.extend(len(s) for s in per_tile_blocks)
        rows_union.extend(8 * len(s) for s in per_tile_blocks)
    pt = np.array(pairs_tile)
    bs = np.array(blocks_sum)
    bu = np.array(blocks_union)
    ru = np.array(rows_union)
    print(
        f"pair-DMA (L0 3^3): pairs/tile mean {pt.mean():6.1f} "
        f"p90 {np.percentile(pt, 90):5.0f}   8-row DMA blocks/tile "
        f"per-offset-sum mean {bs.mean():6.1f} (rows {8 * bs.mean():6.0f})  "
        f"union mean {bu.mean():6.1f} p90 {np.percentile(bu, 90):5.0f} "
        f"(rows mean {ru.mean():6.0f} p90 {np.percentile(ru, 90):6.0f})   "
        f"window engine stages R={R}"
    )
    # floor GEMM sized from the MEAN staged union rows (a uniform p90
    # overstates the candidate's MXU floor — ADVICE r4); the p90 is
    # printed above for the conservative reading
    return (
        float(pt.mean()),
        float(ru.mean()),
        int(np.ceil(pt.sum() / len(events) * B / TILE)),
    )


# ---------------------------------------------------------------- part 2
def run_tpu(nbricks4, nbricks8, pairs_per_tile, s_rows, n_tiles):
    import jax
    import jax.numpy as jnp

    from sparseeventid_tpu import ops
    from sparseeventid_tpu.ops import engine
    from sparseeventid_tpu.ops.pallas import window_conv as wc
    from sparseeventid_tpu.ops.pallas.window_engine import (
        build_submanifold_window_plan,
    )

    r = np.random.default_rng(0)

    def timeit(fn, *args, iters=20):
        o = fn(*args)
        _ = float(jnp.sum(o.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        _ = float(jnp.sum(o.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1000

    def chain(f, n):
        # every array operand is a jit ARGUMENT: closure-captured weights
        # are compile-time constants that XLA can fold/reassociate across
        # the chain (measured: a folded brick GEMM chain "ran" at 3.4x
        # chip peak — the repo's zero-arg-closure trap, PERF_NOTES r2)
        def g(x, *ws):
            for _ in range(n):
                x = f(x, *ws)
            return x
        return jax.jit(g)

    def slope(f, x, label, scale=1.0, note="", extra=()):
        t1 = timeit(chain(f, 1), x, *extra)
        t8 = timeit(chain(f, 8), x, *extra)
        s = (t8 - t1) / 7 * scale
        print(
            f"{label:28s} N=1 {t1:7.2f}  N=8 {t8:7.2f}  "
            f"-> {s:7.3f} ms/conv {note}",
            flush=True,
        )
        return s

    # -------- production baseline: real window conv on bench data
    coords = np.full((B, CAP, 3), -1, np.int32)
    for bb, c in enumerate(make_coords()):
        coords[bb, : len(c)] = c
    feats = jnp.asarray(
        r.integers(-3, 4, (B, CAP, C)).astype(np.float32), jnp.bfloat16
    )
    st = ops.build_sparse_tensor(
        jnp.asarray(coords), feats.astype(jnp.float32), GRID
    )
    st = st.with_feats(st.feats.astype(jnp.bfloat16))
    print("building window plan on device...", flush=True)
    plan = jax.jit(
        lambda s: build_submanifold_window_plan(
            s, (3, 3, 3), overflow_cap=engine._overflow_cap(s.capacity),
            window_r=R,
        )
    )(st)
    _ = float(jnp.sum(plan.start))
    keys = st.keys()
    w = jnp.asarray(
        r.integers(-2, 3, (K, C, CO)).astype(np.float32), jnp.bfloat16
    )
    base = lambda x, kk, qk, stt, ww, qa: wc.window_conv_apply(
        kk, x, qk, stt, ww, qa, plan.dkeys, window_r=R, q_bound=None,
    ).astype(jnp.bfloat16)
    t_base = slope(
        base, st.feats, "production window conv",
        note="(total incl. compare+staging)",
        extra=(keys, plan.qmeta, plan.start, w, plan.q_active),
    )

    # -------- (a) brick floor: im2col GEMM, all gathers free.
    # Full M = nbricks * b^3 (batch total) is GB-scale; GEMMs are linear
    # in M at fixed K,N so measure a 128k-row slice and scale.
    kdim = K * C  # 864
    m_probe = 131072
    wa = jnp.asarray(
        r.integers(-2, 3, (kdim, CO)).astype(np.float32), jnp.bfloat16
    )
    wb = jnp.asarray(
        r.integers(-2, 3, (CO, kdim)).astype(np.float32), jnp.bfloat16
    )
    a = jnp.asarray(
        r.integers(-3, 4, (m_probe, kdim)).astype(np.float32), jnp.bfloat16
    )
    # round-trip keeps chain shapes stable; each leg is the same
    # pass-count GEMM, so one im2col GEMM = slope/2
    gemm = lambda x, u, v: ((x @ u) @ v).astype(jnp.bfloat16)
    for b_edge, nb in ((4, nbricks4), (8, nbricks8)):
        m_full = nb * B * b_edge ** 3
        s = slope(
            gemm, a, f"brick b={b_edge} floor GEMM",
            scale=0.5 * m_full / m_probe,
            note=f"(scaled to M={m_full})",
            extra=(wa, wb),
        )
        print(
            f"    -> brick b={b_edge} floor {s:6.3f} ms/conv vs "
            f"production TOTAL {t_base:6.3f} "
            f"({'LOSES' if s > t_base else 'wins'} before any halo "
            f"gather/mask/scatter cost)"
        )

    # -------- (b) pair-list floor: per-tile one-hot row select from the
    # DMA-staged blocks + weight apply, all DMA free.
    # select: OH[tiles, Ppad, S] @ X[tiles, S, C]; weights: [pairs, C]@[C, CO]
    s_pad = int(np.ceil(s_rows / 128) * 128)
    p_pad = int(np.ceil(pairs_per_tile / 128) * 128)
    nt_probe = 256
    oh = jnp.asarray(
        (r.random((nt_probe, p_pad, s_pad)) < 0.01).astype(np.float32),
        jnp.bfloat16,
    )
    xs = jnp.asarray(
        r.integers(-3, 4, (nt_probe, s_pad, C)).astype(np.float32),
        jnp.bfloat16,
    )
    import functools

    bdot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # chain via a back-projection [t,P,C] -> [t,S,C] whose GEMM has the
    # same pass count as the select leg, so one select = slope/2
    proj = jnp.asarray(
        (r.random((nt_probe, s_pad, p_pad)) < 0.01).astype(np.float32),
        jnp.bfloat16,
    )

    def sel_chain(x, o, pr):
        g = bdot(o, x).astype(jnp.bfloat16)  # [t, Ppad, C]
        return bdot(pr, g).astype(jnp.bfloat16)  # [t, Spad, C]

    s_sel = slope(
        sel_chain, xs, "pair select GEMM (x2 legs)",
        scale=n_tiles / nt_probe,
        note=f"(scaled to {n_tiles} tiles, S={s_pad}, P={p_pad})",
        extra=(oh, proj),
    )
    # per-pair weights are unavoidable: pairs sorted by offset give a
    # block-diagonal weight GEMM via k-slot expansion [P, K*C] @ [K*C, CO]
    # (the cheapest exact strategy not already measured slower: grouped
    # per-k small dots regressed 27% in r2, whole-table premul 2.3x in r4)
    mw = nt_probe * p_pad
    wk = jnp.asarray(
        r.integers(-2, 3, (kdim, CO)).astype(np.float32), jnp.bfloat16
    )
    wkb = jnp.asarray(
        r.integers(-2, 3, (CO, kdim)).astype(np.float32), jnp.bfloat16
    )
    px = jnp.asarray(
        r.integers(-3, 4, (mw, kdim)).astype(np.float32), jnp.bfloat16
    )
    s_kslot = slope(
        lambda x, u, v: ((x @ u) @ v).astype(jnp.bfloat16), px,
        "pair k-slot weight GEMM",
        scale=0.5 * n_tiles / nt_probe,
        note=f"(M={p_pad}/tile, K={kdim}; /2 round-trip)",
        extra=(wk, wkb),
    )
    # scatter-add pairs back to the 128 output rows: one-hot [T, P] @ [P, CO]
    sc = jnp.asarray(
        (r.random((nt_probe, TILE, p_pad)) < 0.01).astype(np.float32),
        jnp.bfloat16,
    )
    scb = jnp.asarray(
        (r.random((nt_probe, p_pad, TILE)) < 0.01).astype(np.float32),
        jnp.bfloat16,
    )
    pco = jnp.asarray(
        r.integers(-3, 4, (nt_probe, p_pad, CO)).astype(np.float32),
        jnp.bfloat16,
    )
    s_scatter = slope(
        lambda x, s1, s2: bdot(s2, bdot(s1, x).astype(jnp.bfloat16)).astype(
            jnp.bfloat16
        ),
        pco, "pair scatter GEMM (x2 legs)",
        scale=n_tiles / nt_probe,
        note=f"(T={TILE}, P={p_pad})",
        extra=(sc, scb),
    )
    floor_b = s_sel / 2 + s_kslot + s_scatter / 2
    print(
        f"    -> pair-list floor ~{floor_b:6.3f} ms/conv "
        f"(select/2 + k-slot weights + scatter/2; excludes ALL DMA issue,"
        f" one-hot generation, and the [P,K*C] expand) vs production "
        f"TOTAL {t_base:6.3f} ({'LOSES' if floor_b > t_base else 'wins'})"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host-only", action="store_true")
    args = ap.parse_args()

    from sparseeventid_tpu.ops.rulebook import kernel_offsets

    events = make_coords()
    print(f"bench-shaped tracks, {ACTIVE} active/event, batch {B}")
    nb4, _ = brick_stats(events, 4)
    nb8, _ = brick_stats(events, 8)
    offs3 = np.asarray(kernel_offsets((3, 3, 3), centered=True))
    ppt, s_rows, _ = pair_dma_stats(events, offs3)
    n_tiles = int(np.ceil(ACTIVE / TILE)) * B
    print(f"tiles/batch {n_tiles}")
    if args.host_only:
        return
    run_tpu(nb4, nb8, ppt, s_rows, n_tiles)


if __name__ == "__main__":
    main()
