"""Window-conv engine: plan construction, exact overflow sidecar, and
custom-VJP convolution ops built on the kernels in window_conv.py.

A ``WindowPlan`` is built once per site set (one per submanifold block
series — SCN caches the analogous rulebook in C++ metadata) and reused by
every conv sharing that site set, forward and backward:

  * in-window pairs ride the Pallas sorted-window kernel (MXU);
  * the rare out-of-window pairs (uncovered by the per-tile window) are
    resolved exactly through a small compacted searchsorted + scatter-add
    sidecar, with a drop counter if the static overflow capacity is hit.

Backward passes need no scatter: for submanifold convs the transpose
rulebook is the mirrored-offset rulebook (query columns permuted), and for
strided convs a reverse plan (one live offset column per input row) plays
the same role.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..rulebook import _lookup, kernel_offsets
from ..sparse_tensor import INVALID_KEY, SparseTensor, linearize
from .window_conv import (
    INVALID_QUERY,
    _padded_table,
    compute_query_keys,
    window_conv_apply,
    window_gather,
    window_plan,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowPlan:
    """Per-site-set plan for the windowed conv engine."""

    qkeys: jax.Array  # i32[B, M, K] query keys (INVALID_QUERY when dead)
    start: jax.Array  # i32[B, n_tiles, K] window starts
    ov_src: jax.Array  # i32[B, S] table row of overflow pair
    ov_dst: jax.Array  # i32[B, S] output row
    ov_k: jax.Array  # i32[B, S] offset column
    ov_valid: jax.Array  # bool[B, S]
    ov_dropped: jax.Array  # i32[B] pairs lost to the static cap (should be 0)
    offsets: Tuple[Tuple[int, ...], ...] = dataclasses.field(
        metadata=dict(static=True)
    )

    @property
    def num_offsets(self) -> int:
        return self.qkeys.shape[2]


def _compact_overflow(
    keys: jax.Array,  # [B, N_table]
    qkeys: jax.Array,  # [B, M, K]
    uncovered: jax.Array,  # i32[B, M, K]
    cap: int,
):
    """Resolve uncovered queries exactly -> compacted (src, dst, k) pairs."""
    b, m, k = qkeys.shape
    flat_q = qkeys.reshape(b, m * k)
    unc = (uncovered.reshape(b, m * k) != 0) & (flat_q != INVALID_QUERY)

    def one(u, q):
        rank = jnp.cumsum(u.astype(jnp.int32)) - 1
        slot = jnp.where(u, rank, cap)
        q_ov = jnp.full((cap,), INVALID_QUERY, jnp.int32).at[slot].set(
            q, mode="drop"
        )
        flat_idx = jnp.arange(m * k, dtype=jnp.int32)
        pos = jnp.full((cap,), 0, jnp.int32).at[slot].set(flat_idx, mode="drop")
        total = jnp.sum(u.astype(jnp.int32))
        return q_ov, pos, jnp.maximum(total - cap, 0)

    q_ov, pos, dropped = jax.vmap(one)(unc, flat_q)
    dst = pos // k
    kk = pos % k
    src, hit = _lookup(keys, q_ov)
    valid = hit & (q_ov != INVALID_QUERY)
    return src, dst, kk, valid, dropped


def build_submanifold_window_plan(
    st: SparseTensor,
    kernel_size,
    overflow_cap: int = 2048,
    interpret: bool = False,
) -> WindowPlan:
    """Plan for a submanifold conv (output sites == input sites)."""
    offs = kernel_offsets(kernel_size, centered=True)
    qkeys = compute_query_keys(st, offs)
    keys = st.keys()
    pk, _ = _padded_table(keys, st.feats[..., :1])
    start, uncov = window_plan(pk, qkeys, interpret=interpret)
    src, dst, kk, valid, dropped = _compact_overflow(
        keys, qkeys, uncov, overflow_cap
    )
    return WindowPlan(
        qkeys, start, src, dst, kk, valid, dropped,
        offsets=tuple(map(tuple, offs.tolist())),
    )


def build_strided_window_plans(
    st: SparseTensor,
    skeleton: SparseTensor,
    stride,
    overflow_cap: int = 2048,
    interpret: bool = False,
) -> Tuple[WindowPlan, WindowPlan]:
    """(forward, reverse) plans for a strided conv (filter == stride).

    forward: queries from output sites into the input table
             (q = out*stride + delta).
    reverse: one live column per INPUT row — its parent's key in the output
             table at the row's intra-cell offset (used for dX, dW)."""
    stride = tuple(int(s) for s in stride)
    offs = kernel_offsets(stride, centered=False)
    k = len(offs)

    # forward queries
    q = (
        skeleton.coords[:, :, None, :] * jnp.asarray(stride, jnp.int32)
        + jnp.asarray(offs, jnp.int32)[None, None]
    )
    in_bounds = jnp.all(
        (q >= 0) & (q < jnp.asarray(st.grid_shape, jnp.int32)), axis=-1
    )
    qk = linearize(q, st.grid_shape)
    valid = in_bounds & skeleton.row_mask()[:, :, None] & (qk != INVALID_KEY)
    qkeys_f = jnp.where(valid, qk, INVALID_QUERY)
    keys_in = st.keys()
    pk_in, _ = _padded_table(keys_in, st.feats[..., :1])
    start_f, uncov_f = window_plan(pk_in, qkeys_f, interpret=interpret)
    src, dst, kk, val, drop = _compact_overflow(
        keys_in, qkeys_f, uncov_f, overflow_cap
    )
    fwd = WindowPlan(
        qkeys_f, start_f, src, dst, kk, val, drop,
        offsets=tuple(map(tuple, offs.tolist())),
    )

    # reverse queries: input row -> parent key, one-hot over offset columns
    parent = st.coords // jnp.asarray(stride, jnp.int32)
    pkey = linearize(parent, skeleton.grid_shape)
    rem = st.coords - parent * jnp.asarray(stride, jnp.int32)
    off_id = rem[..., 0]
    for d in range(1, rem.shape[-1]):
        off_id = off_id * np.int32(stride[d]) + rem[..., d]
    mask = st.row_mask()
    cols = jnp.arange(k, dtype=jnp.int32)[None, None, :]
    qkeys_r = jnp.where(
        (off_id[..., None] == cols) & mask[..., None] & (pkey[..., None] != INVALID_KEY),
        pkey[..., None],
        INVALID_QUERY,
    )
    keys_out = skeleton.keys()
    pk_out, _ = _padded_table(
        keys_out, jnp.zeros((*keys_out.shape, 1), jnp.float32)
    )
    start_r, uncov_r = window_plan(pk_out, qkeys_r, interpret=interpret)
    src_r, dst_r, kk_r, val_r, drop_r = _compact_overflow(
        keys_out, qkeys_r, uncov_r, overflow_cap
    )
    rev = WindowPlan(
        qkeys_r, start_r, src_r, dst_r, kk_r, val_r, drop_r,
        offsets=tuple(map(tuple, offs.tolist())),
    )
    return fwd, rev


# --------------------------------------------------------------------------
# overflow application (XLA, small static capacity)
# --------------------------------------------------------------------------

def _apply_overflow(out, table_feats, w, src, dst, kk, valid):
    """out[b, dst] += W[k] @ table[b, src] for valid overflow pairs."""
    k, c, co = w.shape
    m = out.shape[1]

    def one(o, f, s, d, kx, v):
        rows = jnp.take(f, jnp.where(v, s, 0), axis=0)  # [S, C]
        oh = jax.nn.one_hot(kx, k, dtype=jnp.float32)  # [S, K]
        wsel = jnp.einsum(
            "sk,kco->sco", oh, w.astype(jnp.float32)
        )  # [S, C, CO]
        contrib = jnp.einsum(
            "sc,sco->so", rows.astype(jnp.float32), wsel
        )
        contrib = jnp.where(v[:, None], contrib, 0).astype(o.dtype)
        d_safe = jnp.where(v, d, m)
        return o.at[d_safe].add(contrib, mode="drop")

    return jax.vmap(one)(out, table_feats, src, dst, kk, valid)


def _overflow_dw(table_feats, g_out, src, dst, kk, valid, k):
    """dW[k] += x[src] (x) dy[dst] over valid pairs."""
    def one(f, gy, s, d, kx, v):
        xs = jnp.take(f, jnp.where(v, s, 0), axis=0).astype(jnp.float32)
        dys = jnp.take(gy, jnp.where(v, d, 0), axis=0).astype(jnp.float32)
        oh = jax.nn.one_hot(kx, k, dtype=jnp.float32) * v[:, None]
        return jnp.einsum("sk,sc,so->kco", oh, xs, dys)

    return jnp.sum(jax.vmap(one)(table_feats, g_out, src, dst, kk, valid), axis=0)


# --------------------------------------------------------------------------
# submanifold conv with custom VJP
# --------------------------------------------------------------------------

def _mirror_perm(offsets) -> np.ndarray:
    offs = np.asarray(offsets)
    lookup = {tuple(o): i for i, o in enumerate(offs.tolist())}
    return np.array([lookup[tuple(-np.asarray(o))] for o in offs.tolist()])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def _subm_window_conv(offsets, feats, w, interpret, keys, qkeys, start,
                      ov_src, ov_dst, ov_k, ov_valid):
    out = window_conv_apply(keys, feats, qkeys, start, w, interpret=interpret)
    return _apply_overflow(out, feats, w, ov_src, ov_dst, ov_k, ov_valid)


def _subm_fwd(offsets, feats, w, interpret, keys, qkeys, start,
              ov_src, ov_dst, ov_k, ov_valid):
    out = _subm_window_conv(
        offsets, feats, w, interpret, keys, qkeys, start,
        ov_src, ov_dst, ov_k, ov_valid,
    )
    return out, (feats, w, keys, qkeys, start, ov_src, ov_dst, ov_k, ov_valid)


def _subm_bwd(offsets, interpret, res, gy):
    feats, w, keys, qkeys, start, ov_src, ov_dst, ov_k, ov_valid = res
    k, c, co = w.shape
    perm = jnp.asarray(_mirror_perm(offsets))
    gy = gy.astype(feats.dtype)
    # dX: mirrored query columns, transposed weights; overflow transposes
    # (src <-> dst) with the same offset column (W[k]^T pairs with it).
    w_t = jnp.transpose(w, (0, 2, 1))
    dx = window_conv_apply(
        keys, gy, qkeys[:, :, perm], start[:, :, perm], w_t,
        interpret=interpret,
    )
    dx = _apply_overflow(dx, gy, w_t, ov_dst, ov_src, ov_k, ov_valid)
    # dW = g^T dy (+ overflow pairs)
    g = window_gather(keys, feats, qkeys, start, interpret=interpret)
    dw = jnp.einsum(
        "bnm,bno->mo", g.astype(jnp.float32), gy.astype(jnp.float32)
    ).reshape(k, c, co)
    dw = dw + _overflow_dw(feats, gy, ov_src, ov_dst, ov_k, ov_valid, k)
    return dx, dw.astype(w.dtype), None, None, None, None, None, None, None


_subm_window_conv.defvjp(_subm_fwd, _subm_bwd)


def window_submanifold_conv(
    st: SparseTensor,
    plan: WindowPlan,
    w: jax.Array,
    bias: jax.Array | None = None,
    interpret: bool = False,
) -> SparseTensor:
    """Drop-in for ops.submanifold_conv on the windowed engine."""
    out = _subm_window_conv(
        plan.offsets, st.feats, w.astype(st.feats.dtype), interpret,
        st.keys(), plan.qkeys, plan.start,
        plan.ov_src, plan.ov_dst, plan.ov_k, plan.ov_valid,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    out = jnp.where(st.row_mask()[..., None], out, 0)
    return st.with_feats(out)


# --------------------------------------------------------------------------
# strided conv with custom VJP (forward plan + reverse plan)
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def _strided_window_conv(offsets, feats, w, interpret, keys_in, keys_out,
                         fq, fs, fo_src, fo_dst, fo_k, fo_val,
                         rq, rs, ro_src, ro_dst, ro_k, ro_val):
    out = window_conv_apply(keys_in, feats, fq, fs, w, interpret=interpret)
    return _apply_overflow(out, feats, w, fo_src, fo_dst, fo_k, fo_val)


def _strided_fwd(offsets, feats, w, interpret, keys_in, keys_out,
                 fq, fs, fo_src, fo_dst, fo_k, fo_val,
                 rq, rs, ro_src, ro_dst, ro_k, ro_val):
    out = _strided_window_conv(
        offsets, feats, w, interpret, keys_in, keys_out,
        fq, fs, fo_src, fo_dst, fo_k, fo_val,
        rq, rs, ro_src, ro_dst, ro_k, ro_val,
    )
    return out, (feats, w, keys_in, keys_out, fq, fs,
                 fo_src, fo_dst, fo_k, fo_val,
                 rq, rs, ro_src, ro_dst, ro_k, ro_val)


def _strided_bwd(offsets, interpret, res, gy):
    (feats, w, keys_in, keys_out, fq, fs,
     fo_src, fo_dst, fo_k, fo_val,
     rq, rs, ro_src, ro_dst, ro_k, ro_val) = res
    k, c, co = w.shape
    gy = gy.astype(feats.dtype)
    w_t = jnp.transpose(w, (0, 2, 1))
    # dX via the reverse plan: each input row reads its parent's dY through
    # its own offset column.
    dx = window_conv_apply(keys_out, gy, rq, rs, w_t, interpret=interpret)
    dx = _apply_overflow(dx, gy, w_t, ro_src, ro_dst, ro_k, ro_val)
    # dW via reverse gather: g1[b, n_in, K*CO] = dY[parent] in the row's
    # offset column; dW[k] = sum_n x[n] g1[n, k].
    g1 = window_gather(keys_out, gy, rq, rs, interpret=interpret)
    dw = jnp.einsum(
        "bnc,bnm->mc", feats.astype(jnp.float32), g1.astype(jnp.float32)
    ).reshape(k, co, c).transpose(0, 2, 1)
    dw = dw + _overflow_dw(feats, gy, fo_src, fo_dst, fo_k, fo_val, k)
    return (dx, dw.astype(w.dtype)) + (None,) * 14


_strided_window_conv.defvjp(_strided_fwd, _strided_bwd)


def window_strided_conv(
    st: SparseTensor,
    skeleton: SparseTensor,
    fwd_plan: WindowPlan,
    rev_plan: WindowPlan,
    w: jax.Array,
    interpret: bool = False,
) -> SparseTensor:
    """Drop-in for ops.strided_conv on the windowed engine."""
    out = _strided_window_conv(
        fwd_plan.offsets, st.feats, w.astype(st.feats.dtype), interpret,
        st.keys(), skeleton.keys(),
        fwd_plan.qkeys, fwd_plan.start,
        fwd_plan.ov_src, fwd_plan.ov_dst, fwd_plan.ov_k, fwd_plan.ov_valid,
        rev_plan.qkeys, rev_plan.start,
        rev_plan.ov_src, rev_plan.ov_dst, rev_plan.ov_k, rev_plan.ov_valid,
    )
    out = jnp.where(skeleton.row_mask()[..., None], out, 0)
    return skeleton.with_feats(out)
