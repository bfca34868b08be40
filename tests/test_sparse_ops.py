"""Sparse-core correctness: rulebook + conv vs brute-force dense convolution
on tiny grids (the test the reference never had — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparseeventid_tpu import ops


def random_sparse(rng, b, cap, grid, c, density=0.1):
    """Random dense volume + its SparseTensor, nnz <= cap per event."""
    d = len(grid)
    dense = np.zeros((b, *grid, c), np.float32)
    for bi in range(b):
        total = int(np.prod(grid))
        n = min(cap, max(1, int(total * density)))
        flat = rng.choice(total, size=n, replace=False)
        vals = rng.standard_normal((n, c)).astype(np.float32) + 0.5
        # ensure strictly nonzero so from_dense finds every site
        vals[np.abs(vals) < 1e-3] += 1.0
        dense.reshape(b, total, c)[bi, flat] = vals
    st = ops.from_dense(jnp.asarray(dense), capacity=cap)
    return dense, st


def dense_subm_conv(dense, w, offsets, bias=None):
    """Brute-force submanifold conv: output only at active sites."""
    b = dense.shape[0]
    grid = dense.shape[1:-1]
    cin = dense.shape[-1]
    cout = w.shape[-1]
    active = np.any(dense != 0, axis=-1)
    out = np.zeros((*dense.shape[:-1], cout), np.float32)
    for idx in np.argwhere(active):
        bi, *pos = idx
        acc = np.zeros(cout, np.float32)
        for k, off in enumerate(offsets):
            nb = np.array(pos) + np.array(off)
            if np.any(nb < 0) or np.any(nb >= np.array(grid)):
                continue
            nb_t = (bi, *nb)
            if not active[nb_t]:
                continue  # submanifold: only active sites contribute
            acc += w[k].T @ dense[nb_t]
        if bias is not None:
            acc += bias
        out[(bi, *pos)] = acc
    return out


@pytest.mark.parametrize("dim,grid", [(2, (11, 13)), (3, (7, 8, 9))])
def test_submanifold_conv_matches_dense(dim, grid):
    rng = np.random.default_rng(0)
    b, cap, cin, cout = 2, 32, 3, 5
    dense, st = random_sparse(rng, b, cap, grid, cin, density=0.15)
    ksz = (3,) * dim
    offs = ops.kernel_offsets(ksz)
    w = rng.standard_normal((len(offs), cin, cout)).astype(np.float32) * 0.3
    bias = rng.standard_normal(cout).astype(np.float32)

    rb = ops.build_submanifold_rulebook(st, ksz)
    out_st = ops.submanifold_conv(st, rb, jnp.asarray(w), jnp.asarray(bias))
    got = np.asarray(ops.to_dense(out_st))

    want = dense_subm_conv(dense, w, offs, bias)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_submanifold_preserves_sites():
    rng = np.random.default_rng(1)
    _, st = random_sparse(rng, 2, 16, (6, 6, 6), 2)
    rb = ops.build_submanifold_rulebook(st, (3, 3, 3))
    w = jnp.zeros((27, 2, 4)) + 0.1
    out = ops.submanifold_conv(st, rb, w)
    np.testing.assert_array_equal(np.asarray(out.coords), np.asarray(st.coords))
    np.testing.assert_array_equal(np.asarray(out.n_active), np.asarray(st.n_active))


def test_anisotropic_kernel_2d_multiplane():
    """Kernel [1, 3, 3] with plane axis: no mixing across planes
    (reference resnet.py:30-36, sparse_building_blocks.py:24-27)."""
    rng = np.random.default_rng(2)
    grid = (3, 8, 8)  # 3 planes
    dense, st = random_sparse(rng, 1, 24, grid, 1, density=0.2)
    ksz = (1, 3, 3)
    offs = ops.kernel_offsets(ksz)
    assert len(offs) == 9 and all(o[0] == 0 for o in offs)
    w = rng.standard_normal((9, 1, 2)).astype(np.float32)
    rb = ops.build_submanifold_rulebook(st, ksz)
    got = np.asarray(ops.to_dense(ops.submanifold_conv(st, rb, jnp.asarray(w))))
    want = dense_subm_conv(dense, w, offs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_downsample_unique_coords():
    rng = np.random.default_rng(3)
    dense, st = random_sparse(rng, 2, 40, (8, 8, 8), 2, density=0.1)
    skel, rb = ops.build_downsample(st, (2, 2, 2))
    # expected site set
    for bi in range(2):
        n_in = int(st.n_active[bi])
        cin = np.asarray(st.coords[bi][:n_in])
        want = np.unique(cin // 2, axis=0)
        n_out = int(skel.n_active[bi])
        got = np.asarray(skel.coords[bi][:n_out])
        got = got[np.lexsort(got.T[::-1])]
        want = want[np.lexsort(want.T[::-1])]
        np.testing.assert_array_equal(got, want)
    assert skel.grid_shape == (4, 4, 4)


def test_strided_conv_matches_dense():
    """Strided conv (filter=stride=2): out[o] = sum_delta W[delta] @ in[2o+delta]
    summed over ACTIVE inputs, at sites with >=1 active child."""
    rng = np.random.default_rng(4)
    grid = (6, 6, 6)
    dense, st = random_sparse(rng, 2, 40, grid, 2, density=0.12)
    skel, rb = ops.build_downsample(st, (2, 2, 2))
    offs = ops.kernel_offsets((2, 2, 2), centered=False)
    w = rng.standard_normal((8, 2, 3)).astype(np.float32) * 0.4
    out = ops.strided_conv(st, skel, rb, jnp.asarray(w))
    got = np.asarray(ops.to_dense(out))

    active = np.any(dense != 0, axis=-1)
    want = np.zeros((2, 3, 3, 3, 3), np.float32)
    for bi in range(2):
        parents = {tuple(c // 2) for c in np.argwhere(active[bi])}
        for p in parents:
            acc = np.zeros(3, np.float32)
            for k, off in enumerate(offs):
                child = tuple(np.array(p) * 2 + off)
                if active[(bi, *child)]:
                    acc += w[k].T @ dense[(bi, *child)]
            want[(bi, *p)] = acc
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_downsample_overflow_drops_and_counts():
    rng = np.random.default_rng(5)
    _, st = random_sparse(rng, 1, 60, (8, 8, 8), 1, density=0.12)
    small_cap = 4
    skel, rb = ops.build_downsample(st, (2, 2, 2), out_capacity=small_cap)
    assert int(skel.n_active[0]) <= small_cap
    assert skel.coords.shape[1] == small_cap


def test_deconv_roundtrip_sites():
    """Downsample then deconv back onto the original site set."""
    rng = np.random.default_rng(6)
    _, st = random_sparse(rng, 2, 30, (8, 8, 8), 4, density=0.08)
    skel, rb_down = ops.build_downsample(st, (2, 2, 2))
    w_down = rng.standard_normal((8, 4, 6)).astype(np.float32)
    coarse = ops.strided_conv(st, skel, rb_down, jnp.asarray(w_down))

    rb_up = ops.build_upsample(coarse, st, (2, 2, 2))
    w_up = rng.standard_normal((8, 6, 4)).astype(np.float32)
    fine = ops.deconv(coarse, st, rb_up, jnp.asarray(w_up))
    assert fine.feats.shape == st.feats.shape
    # every originally-active site must receive the parent's features
    for bi in range(2):
        n = int(st.n_active[bi])
        cf = np.asarray(coarse.feats[bi])
        ckeys = {tuple(np.asarray(coarse.coords[bi][i])): cf[i]
                 for i in range(int(coarse.n_active[bi]))}
        for i in range(n):
            c = np.asarray(st.coords[bi][i])
            parent = tuple(c // 2)
            off = c - np.array(parent) * 2
            k = int(off[0] * 4 + off[1] * 2 + off[2])
            want = w_up[k].T @ ckeys[parent]
            np.testing.assert_allclose(
                np.asarray(fine.feats[bi][i]), want, rtol=1e-4, atol=1e-4
            )


def test_average_pooling():
    rng = np.random.default_rng(7)
    dense, st = random_sparse(rng, 1, 30, (4, 4, 4), 2, density=0.3)
    skel, rb = ops.build_downsample(st, (2, 2, 2))
    out = ops.average_pool(st, skel, rb, (2, 2, 2))
    got = np.asarray(ops.to_dense(out))
    # dense average pooling over full 2x2x2 windows
    want = dense.reshape(1, 2, 2, 2, 2, 2, 2, 2).mean(axis=(2, 4, 6))
    active_out = np.any(np.asarray(ops.to_dense(skel.with_feats(
        jnp.ones_like(out.feats)))), axis=-1)
    want = want * active_out[..., None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_masked_batch_norm_stats():
    rng = np.random.default_rng(8)
    dense, st = random_sparse(rng, 2, 30, (6, 6, 6), 3, density=0.1)
    mean, var = ops.masked_batch_stats(st.feats, st.row_mask())
    rows = []
    for bi in range(2):
        rows.append(np.asarray(st.feats[bi][: int(st.n_active[bi])]))
    rows = np.concatenate(rows)
    np.testing.assert_allclose(np.asarray(mean), rows.mean(0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), rows.var(0), rtol=1e-4, atol=1e-4)


def test_group_norm_matches_manual():
    rng = np.random.default_rng(9)
    _, st = random_sparse(rng, 2, 30, (6, 6, 6), 4, density=0.1)
    out = ops.masked_group_norm(st.feats, st.row_mask(), 1, None, None, eps=1e-5)
    for bi in range(2):
        n = int(st.n_active[bi])
        rows = np.asarray(st.feats[bi][:n])
        mu, vv = rows.mean(), rows.var()
        want = (rows - mu) / np.sqrt(vv + 1e-5)
        np.testing.assert_allclose(np.asarray(out[bi][:n]), want, rtol=1e-4, atol=1e-4)


def test_global_pools():
    rng = np.random.default_rng(10)
    dense, st = random_sparse(rng, 2, 30, (4, 4, 4), 3, density=0.2)
    got = np.asarray(ops.global_avg_pool(st))
    want = dense.reshape(2, -1, 3).mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    gmax = np.asarray(ops.global_max_pool(st))
    for bi in range(2):
        n = int(st.n_active[bi])
        np.testing.assert_allclose(
            gmax[bi], np.asarray(st.feats[bi][:n]).max(0), rtol=1e-5
        )


def test_to_dense_from_dense_roundtrip():
    rng = np.random.default_rng(11)
    dense, st = random_sparse(rng, 2, 30, (5, 6, 7), 2, density=0.1)
    np.testing.assert_allclose(np.asarray(ops.to_dense(st)), dense, rtol=1e-6)


def test_build_sparse_tensor_from_padded_coo():
    """larcv-style padded input: -999 fill (data_transforms.py contract)."""
    coords = jnp.asarray(
        [[[1, 2, 3], [0, 0, 0], [-999, -999, -999], [4, 5, 6]]], jnp.int32
    )
    feats = jnp.asarray([[[1.0], [2.0], [7.0], [3.0]]])
    st = ops.build_sparse_tensor(coords, feats, (8, 8, 8))
    assert int(st.n_active[0]) == 3
    # sorted by linear key: (0,0,0) < (1,2,3) < (4,5,6)
    np.testing.assert_array_equal(
        np.asarray(st.coords[0][:3]), [[0, 0, 0], [1, 2, 3], [4, 5, 6]]
    )
    np.testing.assert_allclose(np.asarray(st.feats[0][:4, 0]), [2.0, 1.0, 3.0, 0.0])


def test_sparse_tensor_is_jittable_pytree():
    rng = np.random.default_rng(12)
    _, st = random_sparse(rng, 1, 16, (6, 6, 6), 2)

    @jax.jit
    def f(s):
        rb = ops.build_submanifold_rulebook(s, (3, 3, 3))
        w = jnp.ones((27, 2, 2)) * 0.05
        return ops.submanifold_conv(s, rb, w)

    out = f(st)
    assert out.feats.shape == st.feats.shape
