"""Pallas fused gather-GEMM conv vs the XLA reference path (interpret mode
on CPU; the compiled path is exercised on TPU by bench/verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparseeventid_tpu import ops
from sparseeventid_tpu.ops.pallas.gather_conv import (
    mirror_permutation,
    pallas_submanifold_conv,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    B, N, C = 2, 64, 8
    grid = (12, 12, 12)
    coords = np.full((B, N, 3), -1, np.int32)
    feats = np.zeros((B, N, C), np.float32)
    for b in range(B):
        n = 40
        lin = rng.choice(12**3, n, replace=False)
        c = np.stack(np.unravel_index(lin, grid), -1)
        coords[b, :n] = c
        feats[b, :n] = rng.standard_normal((n, C))
    st = ops.build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats), grid)
    rb = ops.build_submanifold_rulebook(st, (3, 3, 3))
    w = jnp.asarray(rng.standard_normal((27, C, 16)).astype(np.float32) * 0.2)
    return st, rb, w


def test_mirror_permutation_3d():
    offs = tuple(map(tuple, ops.kernel_offsets((3, 3, 3)).tolist()))
    perm = mirror_permutation(offs)
    o = np.asarray(offs)
    np.testing.assert_array_equal(o[perm], -o)
    # centered enumeration mirror == reversal
    np.testing.assert_array_equal(perm, np.arange(len(offs))[::-1])


def test_forward_matches_xla(setup):
    st, rb, w = setup
    ref = ops.submanifold_conv(st, rb, w)
    got = pallas_submanifold_conv(st, rb, w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), rtol=1e-4, atol=1e-5
    )


def test_gradients_match_xla(setup):
    st, rb, w = setup

    def loss_ref(w, f):
        return jnp.sum(ops.submanifold_conv(st.with_feats(f), rb, w).feats ** 2)

    def loss_pal(w, f):
        return jnp.sum(
            pallas_submanifold_conv(st.with_feats(f), rb, w, interpret=True).feats
            ** 2
        )

    gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, st.feats)
    gw_p, gf_p = jax.grad(loss_pal, argnums=(0, 1))(w, st.feats)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_r), rtol=1e-3, atol=1e-4)


def test_anisotropic_kernel(setup):
    """[1,3,3] plane kernel through the pallas path."""
    rng = np.random.default_rng(3)
    grid = (3, 10, 10)
    coords = np.full((1, 32, 3), -1, np.int32)
    feats = np.zeros((1, 32, 4), np.float32)
    n = 20
    lin = rng.choice(300, n, replace=False)
    coords[0, :n] = np.stack(np.unravel_index(lin, grid), -1)
    feats[0, :n] = rng.standard_normal((n, 4))
    st = ops.build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats), grid)
    rb = ops.build_submanifold_rulebook(st, (1, 3, 3))
    w = jnp.asarray(rng.standard_normal((9, 4, 8)).astype(np.float32))
    ref = ops.submanifold_conv(st, rb, w)
    got = pallas_submanifold_conv(st, rb, w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.feats), np.asarray(ref.feats), rtol=1e-4, atol=1e-5
    )
