"""Interpret-mode (CPU) equality check for the fused backward kernels.

The fused one-pass backward (window_conv.window_bwd_subm /
window_bwd_strided) only engages at C, CO multiples of 16 with the CT
orientation (window_engine._fused_bwd_ok) — channel sizes the unit tests
don't cover.  This script compares gradients of the window engine against
the XLA rulebook backend at fused-eligible sizes, entirely on CPU, so it
runs even when the TPU tunnel is down.  Bit-level agreement is checked on
integer-valued data (exact in f32 accumulation).

Usage: python scripts/check_fused_bwd_cpu.py
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparseeventid_tpu import ops
from sparseeventid_tpu.ops.pallas.window_engine import (
    _fused_bwd_ok,
    build_strided_window_plans,
    build_submanifold_window_plan,
    window_strided_conv,
    window_submanifold_conv,
)

GRID = (16, 16, 16)


def make_st(seed, c, b=2, n=256):
    rng = np.random.default_rng(seed)
    coords = np.full((b, n, 3), -1, np.int32)
    # Integer-valued features -> exact f32 accumulation -> bit-level checks.
    feats = np.zeros((b, n, c), np.float32)
    total = int(np.prod(GRID))
    for bi in range(b):
        # Unique sites (the sorted-window engine requires unique keys).
        lin = rng.choice(total, n, replace=False)
        coords[bi] = np.stack(np.unravel_index(lin, GRID), -1)
        feats[bi] = rng.integers(-3, 4, size=(n, c))
    return ops.build_sparse_tensor(
        jnp.asarray(coords), jnp.asarray(feats), GRID
    )


def check_subm(c, co, seed):
    st = make_st(seed, c)
    assert _fused_bwd_ok(27, c, co), f"fused path not engaged at C={c},CO={co}"
    rng = np.random.default_rng(seed + 1)
    w = jnp.asarray(rng.integers(-2, 3, size=(27, c, co)).astype(np.float32))
    rb = ops.build_submanifold_rulebook(st, (3, 3, 3))
    plan = build_submanifold_window_plan(st, (3, 3, 3), interpret=True)
    gy = jnp.asarray(rng.integers(-2, 3, size=(2, 256, co)).astype(np.float32))

    def loss_ref(w, f):
        y = ops.submanifold_conv(st.with_feats(f), rb, w).feats
        return jnp.sum(y * gy)

    def loss_win(w, f):
        y = window_submanifold_conv(st.with_feats(f), plan, w,
                                    interpret=True).feats
        return jnp.sum(y * gy)

    gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, st.feats)
    gw_p, gf_p = jax.grad(loss_win, argnums=(0, 1))(w, st.feats)
    np.testing.assert_array_equal(np.asarray(gw_p), np.asarray(gw_r))
    np.testing.assert_array_equal(np.asarray(gf_p), np.asarray(gf_r))
    print(f"subm fused bwd OK  C={c} CO={co} (bit-exact dW, dX)")


def check_strided(c, co, seed):
    st = make_st(seed, c)
    assert _fused_bwd_ok(8, c, co)
    stride = (2, 2, 2)
    skeleton, rb = ops.build_downsample(st, stride)
    rng = np.random.default_rng(seed + 1)
    w = jnp.asarray(rng.integers(-2, 3, size=(8, c, co)).astype(np.float32))
    fwd_plan, rev_plan = build_strided_window_plans(
        st, skeleton, stride, interpret=True
    )
    n_out = skeleton.coords.shape[1]
    gy = jnp.asarray(
        rng.integers(-2, 3, size=(2, n_out, co)).astype(np.float32)
    )

    def loss_ref(w, f):
        y = ops.strided_conv(st.with_feats(f), skeleton, rb, w).feats
        return jnp.sum(y * gy)

    def loss_win(w, f):
        y = window_strided_conv(
            st.with_feats(f), skeleton, fwd_plan, rev_plan, w,
            interpret=True,
        ).feats
        return jnp.sum(y * gy)

    gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, st.feats)
    gw_p, gf_p = jax.grad(loss_win, argnums=(0, 1))(w, st.feats)
    np.testing.assert_array_equal(np.asarray(gw_p), np.asarray(gw_r))
    np.testing.assert_array_equal(np.asarray(gf_p), np.asarray(gf_r))
    print(f"strided fused bwd OK  C={c} CO={co} (bit-exact dW, dX)")


def check_subm_overflow(c, co, seed):
    """Dense line geometry + a tiny window forces overflow pairs, so the
    twin-complement dW sidecar (swapped src/dst + perm reorder) is hit."""
    rng = np.random.default_rng(seed)
    grid = (64, 20, 20)
    n = 512
    coords = np.full((1, n, 3), -1, np.int32)
    # Dense x=32 plane pierced by an x-line: the line query (31, 10, 10)
    # matches (32, 10, 10) ~210 rows into the plane block while its
    # tile-mates match consecutive line rows — span > WINDOW_R => overflow.
    pts = [(32, y, z) for y in range(20) for z in range(20)]
    pts += [(x, 10, 10) for x in range(64)]
    pts = np.array(sorted(set(pts)), np.int32)
    m = len(pts)
    coords[0, :m] = pts
    feats = np.zeros((1, n, c), np.float32)
    feats[0, :m] = rng.integers(-3, 4, size=(m, c))
    st = ops.build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats), grid)
    rb = ops.build_submanifold_rulebook(st, (3, 3, 3))
    plan = build_submanifold_window_plan(
        st, (3, 3, 3), overflow_cap=2048, interpret=True
    )
    n_ov = int(np.asarray(plan.ov_valid).sum())
    assert n_ov > 0, "geometry failed to force overflow pairs"
    w = jnp.asarray(rng.integers(-2, 3, size=(27, c, co)).astype(np.float32))
    gy = jnp.asarray(rng.integers(-2, 3, size=(1, n, co)).astype(np.float32))

    def loss_ref(w, f):
        y = ops.submanifold_conv(st.with_feats(f), rb, w).feats
        return jnp.sum(y * gy)

    def loss_win(w, f):
        y = window_submanifold_conv(st.with_feats(f), plan, w,
                                    interpret=True).feats
        return jnp.sum(y * gy)

    gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, st.feats)
    gw_p, gf_p = jax.grad(loss_win, argnums=(0, 1))(w, st.feats)
    np.testing.assert_array_equal(np.asarray(gw_p), np.asarray(gw_r))
    np.testing.assert_array_equal(np.asarray(gf_p), np.asarray(gf_r))
    print(f"subm fused bwd + overflow OK  C={c} CO={co} ({n_ov} ov pairs)")


def check_strided_overflow(c, co, seed):
    """Rev-plan overflow: children of a coarse line straddling a dense
    coarse plane put one tile's parents > WINDOW_R apart."""
    rng = np.random.default_rng(seed)
    grid = (128, 40, 40)  # coarse grid (64, 20, 20) after stride 2
    pts = [(32 * 2, 2 * y, 2 * z) for y in range(20) for z in range(20)]
    pts += [(2 * cx + 1, 20, 20) for cx in range(64)]
    pts = np.array(sorted(set(pts)), np.int32)
    n = 512
    m = len(pts)
    coords = np.full((1, n, 3), -1, np.int32)
    coords[0, :m] = pts
    feats = np.zeros((1, n, c), np.float32)
    feats[0, :m] = rng.integers(-3, 4, size=(m, c))
    st = ops.build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats), grid)
    stride = (2, 2, 2)
    skeleton, rb = ops.build_downsample(st, stride)
    fwd_plan, rev_plan = build_strided_window_plans(
        st, skeleton, stride, overflow_cap=2048, interpret=True
    )
    n_ov = int(np.asarray(rev_plan.ov_valid).sum())
    assert n_ov > 0, "geometry failed to force rev-plan overflow"
    w = jnp.asarray(rng.integers(-2, 3, size=(8, c, co)).astype(np.float32))
    n_out = skeleton.coords.shape[1]
    gy = jnp.asarray(
        rng.integers(-2, 3, size=(1, n_out, co)).astype(np.float32)
    )

    def loss_ref(w, f):
        y = ops.strided_conv(st.with_feats(f), skeleton, rb, w).feats
        return jnp.sum(y * gy)

    def loss_win(w, f):
        y = window_strided_conv(
            st.with_feats(f), skeleton, fwd_plan, rev_plan, w,
            interpret=True,
        ).feats
        return jnp.sum(y * gy)

    gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, st.feats)
    gw_p, gf_p = jax.grad(loss_win, argnums=(0, 1))(w, st.feats)
    np.testing.assert_array_equal(np.asarray(gw_p), np.asarray(gw_r))
    np.testing.assert_array_equal(np.asarray(gf_p), np.asarray(gf_r))
    print(f"strided fused bwd + rev overflow OK  C={c} CO={co} "
          f"({n_ov} rev ov pairs)")


def main():
    check_subm(16, 16, seed=10)
    check_subm(32, 32, seed=11)
    check_subm(16, 32, seed=12)
    check_subm_overflow(16, 32, seed=15)
    check_strided(16, 32, seed=13)
    check_strided(32, 64, seed=14)
    check_strided_overflow(16, 32, seed=16)
    print("ALL FUSED BWD CHECKS PASSED")


if __name__ == "__main__":
    main()
