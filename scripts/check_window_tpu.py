#!/usr/bin/env python
"""Fast on-TPU equality check: window engine vs XLA rulebook backend,
forward + gradients, submanifold and strided, on dune3d-like data.

Features/weights/cotangents are integer-valued floats: every product is
exactly representable in bf16 and accumulates exactly in f32, so the
window path (bf16 MXU passes) and the XLA f32 path must agree to the BIT —
any nonzero error is a missing/extra/duplicated conv pair, not roundoff."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparseeventid_tpu import ops
from sparseeventid_tpu.ops import engine
from sparseeventid_tpu.ops.conv import strided_conv, submanifold_conv
from sparseeventid_tpu.ops.rulebook import (
    build_downsample_rulebook,
    build_submanifold_rulebook,
    downsample_sites,
)
from sparseeventid_tpu.ops.pallas.window_engine import (
    build_strided_window_plans,
    build_submanifold_window_plan,
    window_strided_conv,
    window_submanifold_conv,
)

GRID = (1024, 512, 1280)
BATCH = 4
CAP = 25000
ACTIVE = 20000


def make_st(seed, c):
    r = np.random.default_rng(seed)
    coords = np.full((BATCH, CAP, 3), -1, np.int32)
    for b in range(BATCH):
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
        cc = np.unique(pts.astype(np.int32), axis=0)
        coords[b, : min(len(cc), CAP)] = cc[:CAP]
    feats = r.integers(-3, 4, (BATCH, CAP, c)).astype(np.float32)
    st = ops.build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats), GRID)
    return st


def main():
    c = 32
    st = make_st(0, c)
    r = np.random.default_rng(1)

    for ksz in [(3, 3, 3), (5, 5, 5)]:
        k = int(np.prod(ksz))
        w = jnp.asarray(r.integers(-2, 3, (k, c, c)).astype(np.float32))

        @jax.jit
        def xla_fwd(s, ww):
            rb = build_submanifold_rulebook(s, ksz)
            return submanifold_conv(s, rb, ww).feats

        @jax.jit
        def win_fwd(s, ww):
            plan = build_submanifold_window_plan(
                s, ksz, overflow_cap=engine._overflow_cap(s.capacity, int(np.prod(ksz)))
            )
            return window_submanifold_conv(s, plan, ww).feats, plan.ov_dropped

        a = xla_fwd(st, w)
        bfeats, dropped = win_fwd(st, w)
        err = float(jnp.max(jnp.abs(a - bfeats)))
        print(f"subm {ksz}: max |xla - window| = {err:.2e}, "
              f"ov_dropped = {np.asarray(dropped).tolist()}")
        assert err < 1e-3, "FORWARD MISMATCH"

        # gradients
        ct = jnp.asarray(
            r.integers(-2, 3, (BATCH, CAP, c)).astype(np.float32)
        )

        def loss_win(ww, f):
            plan = build_submanifold_window_plan(
                st.with_feats(f), ksz,
                overflow_cap=engine._overflow_cap(st.capacity, k),
            )
            o = window_submanifold_conv(st.with_feats(f), plan, ww)
            return jnp.sum(o.feats.astype(jnp.float32) * ct)

        def loss_xla(ww, f):
            rb = build_submanifold_rulebook(st, ksz)
            o = submanifold_conv(st.with_feats(f), rb, ww)
            return jnp.sum(o.feats.astype(jnp.float32) * ct)

        gw_w, gf_w = jax.jit(jax.grad(loss_win, argnums=(0, 1)))(w, st.feats)
        gw_x, gf_x = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(w, st.feats)
        ew = float(jnp.max(jnp.abs(gw_w - gw_x)) / (jnp.max(jnp.abs(gw_x)) + 1e-9))
        ef = float(jnp.max(jnp.abs(gf_w - gf_x)) / (jnp.max(jnp.abs(gf_x)) + 1e-9))
        print(f"  grad rel err: dW {ew:.2e}, dX {ef:.2e}")
        assert ew < 1e-3 and ef < 1e-3, "GRAD MISMATCH"

    # strided
    w8 = jnp.asarray(r.integers(-2, 3, (8, c, c)).astype(np.float32))
    skeleton = downsample_sites(st, (2, 2, 2), out_capacity=CAP // 2)

    @jax.jit
    def xla_s(s, ww):
        rb = build_downsample_rulebook(s, skeleton, (2, 2, 2))
        return strided_conv(s, skeleton, rb, ww).feats

    @jax.jit
    def win_s(s, ww):
        fwd, rev = build_strided_window_plans(
            s, skeleton, (2, 2, 2),
            overflow_cap=engine._overflow_cap(s.capacity),
        )
        return window_strided_conv(s, skeleton, fwd, rev, ww).feats

    a = xla_s(st, w8)
    b = win_s(st, w8)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"strided (2,2,2): max |xla - window| = {err:.2e}")
    assert err < 1e-3

    ct2 = jnp.asarray(
        r.integers(-2, 3, (BATCH, CAP // 2, c)).astype(np.float32)
    )

    def loss_sw(ww, f):
        fwd, rev = build_strided_window_plans(
            st.with_feats(f), skeleton, (2, 2, 2),
            overflow_cap=engine._overflow_cap(st.capacity, 8),
        )
        o = window_strided_conv(st.with_feats(f), skeleton, fwd, rev, ww)
        return jnp.sum(o.feats.astype(jnp.float32) * ct2)

    def loss_sx(ww, f):
        rb = build_downsample_rulebook(st, skeleton, (2, 2, 2))
        o = strided_conv(st.with_feats(f), skeleton, rb, ww)
        return jnp.sum(o.feats.astype(jnp.float32) * ct2)

    gw_w, gf_w = jax.jit(jax.grad(loss_sw, argnums=(0, 1)))(w8, st.feats)
    gw_x, gf_x = jax.jit(jax.grad(loss_sx, argnums=(0, 1)))(w8, st.feats)
    ew = float(jnp.max(jnp.abs(gw_w - gw_x)) / (jnp.max(jnp.abs(gw_x)) + 1e-9))
    ef = float(jnp.max(jnp.abs(gf_w - gf_x)) / (jnp.max(jnp.abs(gf_x)) + 1e-9))
    print(f"  strided grad rel err: dW {ew:.2e}, dX {ef:.2e}")
    assert ew < 1e-3 and ef < 1e-3

    # deconvolution: coarse -> fine onto the original site set (the strided
    # kernels transposed; sparse_building_blocks.py:202-229)
    from sparseeventid_tpu.ops.conv import deconv
    from sparseeventid_tpu.ops.pallas.window_engine import window_deconv
    from sparseeventid_tpu.ops.rulebook import build_upsample

    coarse = skeleton.with_feats(
        jnp.asarray(
            r.integers(-2, 3, (BATCH, CAP // 2, c)).astype(np.float32)
        )
        * skeleton.row_mask()[..., None]
    )
    wd = jnp.asarray(r.integers(-2, 3, (8, c, c)).astype(np.float32))

    @jax.jit
    def xla_d(cs, ww):
        rb = build_upsample(cs, st, (2, 2, 2))
        return deconv(cs, st, rb, ww).feats

    @jax.jit
    def win_d(cs, ww):
        fwd, rev = build_strided_window_plans(
            st, cs, (2, 2, 2),
            overflow_cap=engine._overflow_cap(st.capacity, 8),
        )
        return window_deconv(cs, st, fwd, rev, ww).feats

    a = xla_d(coarse, wd)
    b = win_d(coarse, wd)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"deconv (2,2,2): max |xla - window| = {err:.2e}")
    assert err < 1e-3

    ct3 = jnp.asarray(r.integers(-2, 3, (BATCH, CAP, c)).astype(np.float32))

    def loss_dw(ww, f):
        fwd, rev = build_strided_window_plans(
            st, coarse.with_feats(f), (2, 2, 2),
            overflow_cap=engine._overflow_cap(st.capacity, 8),
        )
        o = window_deconv(coarse.with_feats(f), st, fwd, rev, ww)
        return jnp.sum(o.feats.astype(jnp.float32) * ct3)

    def loss_dx(ww, f):
        rb = build_upsample(coarse, st, (2, 2, 2))
        o = deconv(coarse.with_feats(f), st, rb, ww)
        return jnp.sum(o.feats.astype(jnp.float32) * ct3)

    gw_w, gf_w = jax.jit(jax.grad(loss_dw, argnums=(0, 1)))(wd, coarse.feats)
    gw_x, gf_x = jax.jit(jax.grad(loss_dx, argnums=(0, 1)))(wd, coarse.feats)
    ew = float(jnp.max(jnp.abs(gw_w - gw_x)) / (jnp.max(jnp.abs(gw_x)) + 1e-9))
    ef = float(jnp.max(jnp.abs(gf_w - gf_x)) / (jnp.max(jnp.abs(gf_x)) + 1e-9))
    print(f"  deconv grad rel err: dW {ew:.2e}, dX {ef:.2e}")
    assert ew < 1e-3 and ef < 1e-3
    print("ALL EQUALITY CHECKS PASSED")


if __name__ == "__main__":
    main()
