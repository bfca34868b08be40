"""Sorted-window conv engine vs the XLA rulebook path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparseeventid_tpu import ops
from sparseeventid_tpu.ops.pallas.window_engine import (
    build_strided_window_plans,
    build_submanifold_window_plan,
    window_strided_conv,
    window_submanifold_conv,
)


def make_st(seed=0, b=2, n=256, grid=(16, 16, 16), c=8, density=0.05):
    rng = np.random.default_rng(seed)
    coords = np.full((b, n, 3), -1, np.int32)
    feats = np.zeros((b, n, c), np.float32)
    total = int(np.prod(grid))
    for bi in range(b):
        m = min(n, int(total * density))
        lin = rng.choice(total, m, replace=False)
        cc = np.stack(np.unravel_index(lin, grid), -1)
        coords[bi, :m] = cc
        feats[bi, :m] = rng.standard_normal((m, c))
    return ops.build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats), grid)


@pytest.mark.parametrize("ksz", [(3, 3, 3), (1, 3, 3)])
def test_subm_forward_matches_xla(ksz):
    st = make_st()
    rng = np.random.default_rng(1)
    k = int(np.prod(ksz))
    w = jnp.asarray(rng.standard_normal((k, 8, 16)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    rb = ops.build_submanifold_rulebook(st, ksz)
    ref = ops.submanifold_conv(st, rb, w, bias)
    plan = build_submanifold_window_plan(st, ksz, interpret=True)
    assert int(jnp.sum(plan.ov_dropped)) == 0
    got = window_submanifold_conv(st, plan, w, bias, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), rtol=1e-4, atol=1e-4
    )


def test_subm_overflow_path_exercised():
    """Force overflow: two clusters far apart in key space in one tile span."""
    grid = (64, 64, 64)
    rng = np.random.default_rng(2)
    b, n, c = 1, 256, 4
    coords = np.full((b, n, 3), -1, np.int32)
    feats = np.zeros((b, n, c), np.float32)
    # cluster A at x=0 plane, cluster B at x=63: x-neighbors of nothing, but
    # y/z neighbors within clusters; a dense line along z to create long
    # key-distance matches: points (0, 0, z) and (63, 0, z).
    pts = [(0, 0, z) for z in range(60)] + [(63, 0, z) for z in range(60)]
    # plus matches ACROSS large key distance: (x, 32, 32) for all x — the
    # x+1 neighbor is ~60 rows away in sorted order here, small; make it
    # bigger by filling z-lines between.
    pts += [(x, 32, 32) for x in range(63)]
    pts = np.array(sorted(set(pts)), np.int32)
    m = len(pts)
    coords[0, :m] = pts
    feats[0, :m] = rng.standard_normal((m, c))
    st = ops.build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats), grid)
    ksz = (3, 3, 3)
    w = jnp.asarray(rng.standard_normal((27, c, 8)).astype(np.float32) * 0.3)
    rb = ops.build_submanifold_rulebook(st, ksz)
    ref = ops.submanifold_conv(st, rb, w)
    plan = build_submanifold_window_plan(st, ksz, overflow_cap=512, interpret=True)
    got = window_submanifold_conv(st, plan, w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), rtol=1e-4, atol=1e-4
    )


def test_subm_gradients_match_xla():
    st = make_st(seed=3)
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.standard_normal((27, 8, 8)).astype(np.float32) * 0.2)
    rb = ops.build_submanifold_rulebook(st, (3, 3, 3))
    plan = build_submanifold_window_plan(st, (3, 3, 3), interpret=True)

    def loss_ref(w, f):
        return jnp.sum(ops.submanifold_conv(st.with_feats(f), rb, w).feats ** 2)

    def loss_win(w, f):
        return jnp.sum(
            window_submanifold_conv(
                st.with_feats(f), plan, w, interpret=True
            ).feats ** 2
        )

    gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, st.feats)
    gw_p, gf_p = jax.grad(loss_win, argnums=(0, 1))(w, st.feats)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_r), rtol=1e-3, atol=1e-4)


def test_subm_gradients_match_xla_fused_bwd():
    """C, CO multiples of 16 engage the fused one-pass backward
    (window_engine._fused_bwd_ok -> window_conv.window_bwd_subm)."""
    from sparseeventid_tpu.ops.pallas.window_engine import _fused_bwd_ok

    assert _fused_bwd_ok(27, 16, 32)
    st = make_st(seed=7, c=16)
    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.standard_normal((27, 16, 32)).astype(np.float32) * 0.2)
    rb = ops.build_submanifold_rulebook(st, (3, 3, 3))
    plan = build_submanifold_window_plan(st, (3, 3, 3), interpret=True)

    def loss_ref(w, f):
        return jnp.sum(ops.submanifold_conv(st.with_feats(f), rb, w).feats ** 2)

    def loss_win(w, f):
        return jnp.sum(
            window_submanifold_conv(
                st.with_feats(f), plan, w, interpret=True
            ).feats ** 2
        )

    gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, st.feats)
    gw_p, gf_p = jax.grad(loss_win, argnums=(0, 1))(w, st.feats)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_r), rtol=1e-3, atol=1e-4)


def test_subm_2d_multiplane_grads_fused_bwd():
    """Fused backward on a 2D multiplane plan ([1, 3, 3] kernel over the
    plane-axis grid) at fused-eligible channels."""
    grid = (3, 32, 32)
    rng = np.random.default_rng(11)
    coords = np.full((2, 128, 3), -1, np.int32)
    feats = np.zeros((2, 128, 16), np.float32)
    for b in range(2):
        pts = np.unique(
            np.stack([rng.integers(0, g, 96) for g in grid], -1), axis=0
        ).astype(np.int32)
        coords[b, : len(pts)] = pts
        feats[b, : len(pts)] = rng.standard_normal((len(pts), 16))
    st = ops.build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats), grid)
    w = jnp.asarray(rng.standard_normal((9, 16, 16)).astype(np.float32) * 0.3)
    rb = ops.build_submanifold_rulebook(st, (1, 3, 3))
    plan = build_submanifold_window_plan(st, (1, 3, 3), interpret=True)

    def loss_ref(w, f):
        return jnp.sum(ops.submanifold_conv(st.with_feats(f), rb, w).feats ** 2)

    def loss_win(w, f):
        return jnp.sum(
            window_submanifold_conv(
                st.with_feats(f), plan, w, interpret=True
            ).feats ** 2
        )

    gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, st.feats)
    gw_p, gf_p = jax.grad(loss_win, argnums=(0, 1))(w, st.feats)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_r), rtol=1e-3, atol=1e-4)


def test_strided_grads_match_xla_fused_bwd():
    """Strided fused backward (window_conv.window_bwd_strided)."""
    st = make_st(seed=9, c=16)
    stride = (2, 2, 2)
    skeleton, rb = ops.build_downsample(st, stride)
    rng = np.random.default_rng(10)
    w = jnp.asarray(rng.standard_normal((8, 16, 32)).astype(np.float32) * 0.3)
    fwd_plan, rev_plan = build_strided_window_plans(
        st, skeleton, stride, interpret=True
    )

    def loss_ref(w, f):
        return jnp.sum(ops.strided_conv(st.with_feats(f), skeleton, rb, w).feats ** 2)

    def loss_win(w, f):
        return jnp.sum(
            window_strided_conv(
                st.with_feats(f), skeleton, fwd_plan, rev_plan, w,
                interpret=True,
            ).feats ** 2
        )

    gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, st.feats)
    gw_p, gf_p = jax.grad(loss_win, argnums=(0, 1))(w, st.feats)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_r), rtol=1e-3, atol=1e-4)


def test_strided_forward_and_grads_match_xla():
    st = make_st(seed=5, c=6)
    stride = (2, 2, 2)
    skeleton, rb = ops.build_downsample(st, stride)
    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.standard_normal((8, 6, 10)).astype(np.float32) * 0.3)

    ref = ops.strided_conv(st, skeleton, rb, w)
    fwd_plan, rev_plan = build_strided_window_plans(
        st, skeleton, stride, interpret=True
    )
    got = window_strided_conv(st, skeleton, fwd_plan, rev_plan, w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), rtol=1e-4, atol=1e-4
    )

    def loss_ref(w, f):
        return jnp.sum(ops.strided_conv(st.with_feats(f), skeleton, rb, w).feats ** 2)

    def loss_win(w, f):
        return jnp.sum(
            window_strided_conv(
                st.with_feats(f), skeleton, fwd_plan, rev_plan, w,
                interpret=True,
            ).feats ** 2
        )

    gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, st.feats)
    gw_p, gf_p = jax.grad(loss_win, argnums=(0, 1))(w, st.feats)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_r), rtol=1e-3, atol=1e-4)


def test_empty_event():
    grid = (16, 16, 16)
    st = ops.build_sparse_tensor(
        jnp.full((1, 64, 3), -1, jnp.int32), jnp.zeros((1, 64, 4)), grid
    )
    plan = build_submanifold_window_plan(st, (3, 3, 3), interpret=True)
    w = jnp.ones((27, 4, 8)) * 0.1
    out = window_submanifold_conv(st, plan, w, interpret=True)
    assert float(jnp.sum(jnp.abs(out.feats))) == 0.0


def test_deconv_forward_and_grads_match_xla():
    """window_deconv (strided kernels transposed) vs ops.deconv, forward +
    dX_coarse + dW (reference sparse_building_blocks.py:202-229)."""
    from sparseeventid_tpu.ops.pallas.window_engine import window_deconv

    st = make_st(seed=7, c=6)
    stride = (2, 2, 2)
    skeleton, rb_down = ops.build_downsample(st, stride)
    rng = np.random.default_rng(8)
    w0 = jnp.asarray(rng.standard_normal((8, 6, 5)).astype(np.float32) * 0.3)
    coarse = ops.strided_conv(st, skeleton, rb_down, w0)

    w = jnp.asarray(rng.standard_normal((8, 5, 7)).astype(np.float32) * 0.3)
    rb_up = ops.build_upsample(coarse, st, stride)
    ref = ops.deconv(coarse, st, rb_up, w)

    # plans: FINE set in the input role (see window_deconv docstring)
    fwd_plan, rev_plan = build_strided_window_plans(
        st, coarse, stride, interpret=True
    )
    got = window_deconv(coarse, st, fwd_plan, rev_plan, w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), rtol=1e-4, atol=1e-4
    )

    def loss_ref(w, f):
        return jnp.sum(
            ops.deconv(coarse.with_feats(f), st, rb_up, w).feats ** 2
        )

    def loss_win(w, f):
        return jnp.sum(
            window_deconv(
                coarse.with_feats(f), st, fwd_plan, rev_plan, w,
                interpret=True,
            ).feats ** 2
        )

    gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, coarse.feats)
    gw_p, gf_p = jax.grad(loss_win, argnums=(0, 1))(w, coarse.feats)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_r), rtol=1e-3, atol=1e-4)


def test_upsample_block_window_backend_matches_xla():
    """ConvolutionUpsample(backend='window') == backend='xla' through the
    flax module (init + apply + engine dispatch)."""
    from sparseeventid_tpu.config.schema import ConvRepresentation
    from sparseeventid_tpu.models.blocks import ConvolutionUpsample

    st = make_st(seed=9, c=6)
    skeleton, rb_down = ops.build_downsample(st, (2, 2, 2))
    rng = np.random.default_rng(10)
    w0 = jnp.asarray(rng.standard_normal((8, 6, 5)).astype(np.float32) * 0.3)
    coarse = ops.strided_conv(st, skeleton, rb_down, w0)

    params = ConvRepresentation()
    outs = {}
    for backend in ("xla", "window"):
        mod = ConvolutionUpsample(
            n_out=7, stride=(2, 2, 2), params=params, backend=backend
        )
        v = mod.init(jax.random.PRNGKey(0), coarse, st, False)
        outs[backend], _ = mod.apply(
            v, coarse, st, False, mutable=["diagnostics"]
        )
    np.testing.assert_allclose(
        np.asarray(outs["window"].feats),
        np.asarray(outs["xla"].feats),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("ksz", [(3, 3, 3), (5, 5, 5), (1, 3, 3)])
def test_query_meta_matches_materialized_qkeys(ksz):
    """The packed qmeta (base key + validity bitmask words) must expand to
    exactly the qkeys array the kernels used to read from HBM — including
    boundary-invalid queries, dead rows, and word-boundary bits (5^3 has
    125 offsets spanning 4 words with bit 31 used in words 0-2)."""
    from sparseeventid_tpu.ops.pallas.window_conv import (
        compute_query_keys,
        compute_query_meta,
        compute_reverse_query_meta,
        compute_strided_query_meta,
        compute_strided_query_keys,
        key_deltas,
        materialize_qkeys,
        INVALID_QUERY,
    )
    from sparseeventid_tpu.ops.rulebook import kernel_offsets

    st = make_st(seed=3, grid=(8, 8, 8), n=128, density=0.3)
    offs = kernel_offsets(ksz, centered=True)
    ref = np.asarray(compute_query_keys(st, offs))  # [B, M, K]
    got = np.asarray(
        materialize_qkeys(
            compute_query_meta(st, offs), key_deltas(st.grid_shape, offs)
        )
    )  # [B, K, M]
    np.testing.assert_array_equal(got, ref.transpose(0, 2, 1))

    # strided forward meta vs the materialized strided qkeys
    from sparseeventid_tpu.ops.rulebook import downsample_sites

    skel, _ = downsample_sites(st, (2, 2, 2), st.capacity, with_dropped=True)
    d_offs = kernel_offsets((2, 2, 2), centered=False)
    ref_f = np.asarray(
        compute_strided_query_keys(skel, st.grid_shape, (2, 2, 2), d_offs)
    )
    got_f = np.asarray(
        materialize_qkeys(
            compute_strided_query_meta(skel, st.grid_shape, (2, 2, 2), d_offs),
            key_deltas(st.grid_shape, d_offs),
        )
    )
    np.testing.assert_array_equal(got_f, ref_f.transpose(0, 2, 1))

    # reverse meta: exactly one live column per live input row, at the
    # parent key
    rq = np.asarray(
        materialize_qkeys(
            compute_reverse_query_meta(st, skel, (2, 2, 2), 8), (0,) * 8
        )
    )  # [B, 8, M]
    live = rq != INVALID_QUERY
    rm = np.asarray(st.row_mask())
    assert np.array_equal(live.sum(axis=1) > 0, rm)
    assert np.all(live.sum(axis=1) <= 1)
