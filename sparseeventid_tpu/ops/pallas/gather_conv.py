"""Pallas fused gather-GEMM sparse convolution.

The XLA gather path (ops/conv.py) moves neighbor rows at ~4 GB/s on TPU
(per-row scalar addressing); this kernel keeps the whole per-event feature
table resident in VMEM (level-0 worst case: 50000 x 32 bf16 = 3.2 MB, and the
capacity schedule keeps N*C roughly constant across levels) and gathers rows
with vectorized in-VMEM dynamic gathers, feeding the MXU directly:

    for each output row-tile T:
        g[T, K*Cin] = feats[idx[T, k]] for k in offsets   (VMEM gather)
        out[T, Cout] = g @ W                              (MXU)

Backward uses the submanifold symmetry: the transpose of the offset-delta
rulebook is the rulebook of the mirrored offsets, so dX is the SAME kernel
with mirrored, transposed weights, and dW = gather(X)^T @ dY (one big GEMM).
No scatter is ever needed (SURVEY.md §7.4 item 3).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rulebook import Rulebook
from ..sparse_tensor import SparseTensor


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gather_matmul_kernel(
    feats_ref,  # [N, Cin] VMEM (whole table)
    idx_ref,  # [T, K] i32 VMEM (miss -> N, points at zero pad row)
    w_ref,  # [K*Cin, Cout] VMEM
    out_ref,  # [T, Cout] VMEM
    *,
    k: int,
    cin: int,
):
    t = idx_ref.shape[0]
    table = feats_ref[:]
    parts = []
    for kk in range(k):
        rows = jnp.take(table, idx_ref[:, kk], axis=0)  # [T, Cin] VMEM gather
        parts.append(rows)
    g = jnp.concatenate(parts, axis=-1)  # [T, K*Cin]
    out_ref[:] = jax.lax.dot_general(
        g,
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def gather_conv_single(
    feats: jax.Array,  # [N, Cin] one batch element (zero at padding rows)
    idx: jax.Array,  # [M, K] i32, miss encoded as N (zero-pad row)
    w: jax.Array,  # [K, Cin, Cout]
    tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Returns [M, Cout]. Misses must point at row N (a zero row is appended)."""
    n, cin = feats.shape
    k, _, cout = w.shape
    m = idx.shape[0]
    m_pad = _round_up(m, tile)
    # zero pad row for misses + pad M to tile multiple
    table = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    if m_pad != m:
        idx = jnp.concatenate(
            [idx, jnp.full((m_pad - m, k), n, jnp.int32)], axis=0
        )
    w2 = w.reshape(k * cin, cout).astype(feats.dtype)

    grid = (m_pad // tile,)
    out = pl.pallas_call(
        functools.partial(_gather_matmul_kernel, k=k, cin=cin),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n + 1, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (k * cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile, cout), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, cout), feats.dtype),
        interpret=interpret,
    )(table, idx, w2)
    return out[:m]


def _encode_miss(rb: Rulebook, n: int) -> jax.Array:
    """Rulebook -> miss-as-N index encoding the kernel expects."""
    return jnp.where(rb.hit, rb.neighbor_idx, n).astype(jnp.int32)


def mirror_permutation(offsets: Tuple[Tuple[int, ...], ...]) -> np.ndarray:
    """Permutation p with offsets[p[k]] == -offsets[k] (row-major centered
    enumeration reverses)."""
    offs = np.asarray(offsets)
    perm = np.zeros(len(offs), np.int64)
    lookup = {tuple(o): i for i, o in enumerate(offs.tolist())}
    for i, o in enumerate(offs.tolist()):
        perm[i] = lookup[tuple(-np.asarray(o))]
    return perm


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def subm_gather_conv(feats, idx_enc, w, offsets, interpret=False):
    """Batched fused submanifold conv. feats [B,N,C], idx_enc [B,N,K] with
    miss->N encoding, w [K,Cin,Cout]. Output sites == input sites."""
    return jax.vmap(
        lambda f, i: gather_conv_single(f, i, w, interpret=interpret)
    )(feats, idx_enc)


def _fwd(feats, idx_enc, w, offsets, interpret=False):
    out = subm_gather_conv(feats, idx_enc, w, offsets, interpret)
    return out, (feats, idx_enc, w)


def _bwd(offsets, interpret, res, g):
    feats, idx_enc, w = res
    k, cin, cout = w.shape
    perm = mirror_permutation(offsets)
    # dX[j] = sum_d W[d]^T dY[nbr_{-d}(j)]: pair W[d]^T (column k = d,
    # unpermuted) with the index column for -d (idx columns permuted by the
    # mirror). Permuting BOTH would cancel out.
    w_t = jnp.transpose(w, (0, 2, 1))  # [K, Cout, Cin]
    dx = jax.vmap(
        lambda gg, ii: gather_conv_single(
            gg, ii[:, jnp.asarray(perm)], w_t, interpret=interpret
        )
    )(g.astype(feats.dtype), idx_enc)
    # dW[k] = sum_i X[nbr_k(i)]^T g[i]  (re-gather X, then one GEMM per k)
    def dw_one(f, ii, gg):
        table = jnp.concatenate([f, jnp.zeros((1, cin), f.dtype)], axis=0)
        gath = jnp.take(table, ii, axis=0)  # [N, K, Cin] (XLA gather: bwd only)
        return jnp.einsum(
            "nkc,no->kco", gath.astype(jnp.float32), gg.astype(jnp.float32)
        )
    dw = jnp.sum(jax.vmap(dw_one)(feats, idx_enc, g), axis=0).astype(w.dtype)
    return dx, None, dw


subm_gather_conv.defvjp(_fwd, _bwd)


def pallas_submanifold_conv(
    st: SparseTensor,
    rb: Rulebook,
    w: jax.Array,
    bias: jax.Array | None = None,
    interpret: bool = False,
) -> SparseTensor:
    """Drop-in replacement for ops.conv.submanifold_conv using the fused
    Pallas kernel (forward + custom VJP)."""
    idx_enc = _encode_miss(rb, st.capacity)
    out = subm_gather_conv(st.feats, idx_enc, w, rb.offsets, interpret)
    if bias is not None:
        out = out + bias.astype(out.dtype)
        out = jnp.where(st.row_mask()[..., None], out, 0)
    return st.with_feats(out)
