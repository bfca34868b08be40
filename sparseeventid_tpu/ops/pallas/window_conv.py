"""Sorted-window implicit-GEMM sparse convolution (Pallas, TPU-native).

The reference's SCN engine resolves (site, kernel-offset) -> neighbor row via
C++ hash tables; XLA's dynamic gather runs at ~16ns/row on TPU, which made a
dune3d training step gather-bound (~26 s).  This engine removes random access
entirely by exploiting the sorted-COO invariant (sparse_tensor.py):

  * Neighbor queries ``q = key_i + lin(delta)`` are monotone per offset, and
    for detector-style data the matching row j sits within ~100 rows of i
    (measured p99 <= 123 on dune3d-like tracks at every pyramid level).
  * A 128-row **anchor array** ``keys[::A]`` gives each query an exact block:
    keys[bl*A] <= q < keys[(bl+1)*A]  =>  match position in [bl*A, (bl+1)*A).
  * Per output tile, a single dynamic VMEM slice of R consecutive table rows
    covers (almost) all matches; the match matrix is built by **key equality**
    (keys are unique) and contracted on the MXU:
        out[T] = (q[T] == win_keys[R]) @ win_table[R, C] @ W
  * The rare out-of-window pairs are resolved exactly by a small compacted
    XLA sidecar (see window_engine) once per site set.

Everything is static-shaped; the only data-dependent values are scalar window
starts computed by the plan kernel (carried in SMEM).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rulebook import kernel_offsets
from ..sparse_tensor import INVALID_KEY, SparseTensor, linearize

# Tunables (see module docstring): T output rows per tile, A anchor stride,
# R window rows (2 blocks). All must be multiples of 8 for TPU tiling.
TILE_T = 128
ANCHOR_A = 128
WINDOW_R = 256

# Sentinel for invalid queries: never equals a real key (>= 0) nor the
# INVALID_KEY padding of the table.
INVALID_QUERY = np.int32(-2)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def compute_query_keys(st: SparseTensor, offsets: np.ndarray) -> jax.Array:
    """q[b, n, k] = linearize(coords + offsets[k]) or INVALID_QUERY."""
    q = st.coords[:, :, None, :] + jnp.asarray(offsets, jnp.int32)[None, None]
    in_bounds = jnp.all(
        (q >= 0) & (q < jnp.asarray(st.grid_shape, jnp.int32)), axis=-1
    )
    qk = linearize(q, st.grid_shape)
    valid = in_bounds & st.row_mask()[:, :, None] & (qk != INVALID_KEY)
    return jnp.where(valid, qk, INVALID_QUERY)


def _pad_rows(x: jax.Array, n_to: int, fill) -> jax.Array:
    n = x.shape[1]
    if n == n_to:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, n_to - n)
    return jnp.pad(x, pad, constant_values=fill)


def _padded_table(keys: jax.Array, feats: jax.Array):
    """Pad keys/feats so any window slice [start, start+R) is in range."""
    b, n = keys.shape
    npad = _cdiv(n, ANCHOR_A) * ANCHOR_A + WINDOW_R
    pk = _pad_rows(keys[..., None], npad, INVALID_KEY)[..., 0]
    pt = _pad_rows(feats, npad, 0)
    return pk, pt


# --------------------------------------------------------------------------
# Plan kernel: anchors -> per-(tile, offset) window start + uncovered mask
# --------------------------------------------------------------------------

def _plan_kernel(anchors_ref, qk_ref, start_ref, uncov_ref, *, k, n_anchor):
    anchors = anchors_ref[0, 0, :]  # [n_anchor_pad]
    tile = pl.program_id(1)
    for kk in range(k):
        q = qk_ref[0, :, kk]  # [T]
        le = (anchors[None, :] <= q[:, None]) & (
            anchors[None, :] != INVALID_KEY
        )
        bl = jnp.sum(le.astype(jnp.int32), axis=1) - 1  # [T], -1 = below keys[0]
        valid = q >= 0
        pos = bl * ANCHOR_A
        big = jnp.int32(2**30)
        start = jnp.min(jnp.where(valid & (bl >= 0), pos, big))
        start = jnp.minimum(start, n_anchor * ANCHOR_A - WINDOW_R)
        start = jnp.maximum(start, 0)
        covered = (
            valid
            & (bl >= 0)
            & (pos >= start)
            & (pos + ANCHOR_A <= start + WINDOW_R)
        )
        start_ref[0, tile, kk] = start
        uncov_ref[0, :, kk] = (valid & ~covered).astype(jnp.int32)


def window_plan(
    padded_keys: jax.Array,  # [B, Npad] (INVALID_KEY padded)
    qkeys: jax.Array,  # [B, N, K]
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """-> (start i32[B, n_tiles, K], uncovered i32[B, N, K])."""
    b, npad = padded_keys.shape
    _, n, k = qkeys.shape
    n_tiles = _cdiv(n, TILE_T)
    n_anchor = npad // ANCHOR_A
    n_anchor_pad = _round_up(n_anchor, 128)
    anchors = padded_keys[:, :: ANCHOR_A][:, :n_anchor]
    anchors = jnp.pad(
        anchors, ((0, 0), (0, n_anchor_pad - n_anchor)),
        constant_values=INVALID_KEY,
    )[:, None, :]  # [B, 1, n_anchor_pad]
    kern = functools.partial(_plan_kernel, k=k, n_anchor=n_anchor)
    start, uncov = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, n_anchor_pad), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T, k), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_tiles, k), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE_T, k), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_tiles, k), jnp.int32),
            jax.ShapeDtypeStruct((b, n_tiles * TILE_T, k), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(anchors, _pad_rows(qkeys, n_tiles * TILE_T, INVALID_QUERY))
    return start, uncov[:, :n]


# --------------------------------------------------------------------------
# Conv kernel: windowed equality one-hot x table x weights
# --------------------------------------------------------------------------

def _conv_kernel(
    keys_ref,  # [1, 1, Npad] VMEM
    table_ref,  # [1, Npad, C] VMEM
    qk_ref,  # [1, T, K] VMEM
    start_ref,  # [1, n_tiles, K] VMEM (full)
    w_ref,  # [KC_pad, CO] VMEM
    out_ref,  # [1, T, CO] VMEM
    g_scratch,  # [T, KC_pad] VMEM
    sk_scratch,  # [K, R] i32 VMEM (staged window keys)
    s_scratch,  # [K, R, C] VMEM (staged window tables)
    *,
    k: int,
    c: int,
    kc_pad: int,
):
    tile = pl.program_id(1)
    if kc_pad > k * c:
        g_scratch[:, k * c :] = jnp.zeros_like(g_scratch[:, k * c :])
    # Stage all K windows, then TWO batched MXU ops instead of 27 small ones.
    for kk in range(k):
        start = pl.multiple_of(start_ref[0, tile, kk], ANCHOR_A)
        sk_scratch[kk] = keys_ref[0, 0, pl.ds(start, WINDOW_R)]
        s_scratch[kk] = table_ref[0, pl.ds(start, WINDOW_R), :]
    q = qk_ref[0]  # [T, K]
    onehot = (
        q.transpose(1, 0)[:, :, None] == sk_scratch[:][:, None, :]
    ).astype(s_scratch.dtype)  # [K, T, R]
    gkt = jax.lax.dot_general(  # [K, T, C]
        onehot, s_scratch[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(g_scratch.dtype)
    for kk in range(k):  # flat layout for the single big GEMM
        g_scratch[:, kk * c : (kk + 1) * c] = gkt[kk]
    out_ref[0] = jax.lax.dot_general(
        g_scratch[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _gather_kernel(
    keys_ref, table_ref, qk_ref, start_ref, g_ref, sk_scratch, s_scratch,
    *, k: int, c: int
):
    """Variant emitting the gathered matrix g [T, K*C] (for dW)."""
    tile = pl.program_id(1)
    for kk in range(k):
        start = pl.multiple_of(start_ref[0, tile, kk], ANCHOR_A)
        sk_scratch[kk] = keys_ref[0, 0, pl.ds(start, WINDOW_R)]
        s_scratch[kk] = table_ref[0, pl.ds(start, WINDOW_R), :]
    q = qk_ref[0]  # [T, K]
    onehot = (
        q.transpose(1, 0)[:, :, None] == sk_scratch[:][:, None, :]
    ).astype(s_scratch.dtype)  # [K, T, R]
    gkt = jax.lax.dot_general(
        onehot, s_scratch[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(g_ref.dtype)
    for kk in range(k):
        g_ref[0, :, kk * c : (kk + 1) * c] = gkt[kk]


def window_conv_apply(
    keys: jax.Array,  # [B, N_in] sorted keys of the table site set
    feats: jax.Array,  # [B, N_in, C] table features
    qkeys: jax.Array,  # [B, M, K] query keys of the output site set
    start: jax.Array,  # [B, n_tiles, K] from window_plan
    w: jax.Array,  # [K, C, CO]
    interpret: bool = False,
) -> jax.Array:
    """-> [B, M, CO] in-window contributions (overflow pairs excluded)."""
    b, m, k = qkeys.shape
    c = feats.shape[-1]
    co = w.shape[-1]
    pk, pt = _padded_table(keys, feats)
    npad = pk.shape[1]
    n_tiles = _cdiv(m, TILE_T)
    qk_p = _pad_rows(qkeys, n_tiles * TILE_T, INVALID_QUERY)
    kc_pad = _round_up(k * c, 128)
    w2 = w.reshape(k * c, co).astype(feats.dtype)
    w2 = jnp.pad(w2, ((0, kc_pad - k * c), (0, 0)))
    kern = functools.partial(_conv_kernel, k=k, c=c, kc_pad=kc_pad)
    out = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, npad), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T, k), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, start.shape[1], k), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((kc_pad, co), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, co), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * TILE_T, co), feats.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE_T, kc_pad), feats.dtype),
            pltpu.VMEM((k, WINDOW_R), jnp.int32),
            pltpu.VMEM((k, WINDOW_R, c), feats.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(pk[:, None, :], pt, qk_p, start, w2)
    return out[:, :m]


def window_gather(
    keys: jax.Array,
    feats: jax.Array,
    qkeys: jax.Array,
    start: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """-> g [B, M, K*C]: the gathered neighbor matrix (for dW)."""
    b, m, k = qkeys.shape
    c = feats.shape[-1]
    pk, pt = _padded_table(keys, feats)
    npad = pk.shape[1]
    n_tiles = _cdiv(m, TILE_T)
    qk_p = _pad_rows(qkeys, n_tiles * TILE_T, INVALID_QUERY)
    kern = functools.partial(_gather_kernel, k=k, c=c)
    g = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, npad), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T, k), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, start.shape[1], k), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, k * c), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * TILE_T, k * c), feats.dtype),
        scratch_shapes=[
            pltpu.VMEM((k, WINDOW_R), jnp.int32),
            pltpu.VMEM((k, WINDOW_R, c), feats.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(pk[:, None, :], pt, qk_p, start)
    return g[:, :m]
