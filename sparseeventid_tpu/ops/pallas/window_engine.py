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
    window_r_default,
    window_r_strided,
    compute_query_keys,
    compute_query_meta,
    compute_reverse_query_meta,
    compute_strided_query_keys,
    compute_strided_query_meta,
    key_deltas,
    overflow_apply,
    overflow_dw,
    window_bwd_strided,
    window_bwd_subm,
    window_conv_apply,
    window_dw,
    window_gather,
    window_plan,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowPlan:
    """Per-site-set plan for the windowed conv engine."""

    qmeta: jax.Array  # i32[B, 1+nw, M] packed query meta: row 0 = base key,
    #                   rows 1+ = per-offset validity bitmask words; kernels
    #                   recompute qk = base + dkeys[k] in registers (the old
    #                   [B, K, M] qkeys array cost 43-200 MB of HBM traffic
    #                   per launch at dune3d scale).  Queries sit in LANES.
    start: jax.Array  # i32[B, n_tiles, K] window starts
    q_active: jax.Array  # i32[B] live rows on the query side (tile skipping)
    ov_src: jax.Array  # i32[B, S] table row of overflow pair
    ov_dst: jax.Array  # i32[B, S] output row
    ov_k: jax.Array  # i32[B, S] offset column
    ov_valid: jax.Array  # bool[B, S]
    ov_dropped: jax.Array  # i32[B] pairs lost to the static cap (should be 0)
    offsets: Tuple[Tuple[int, ...], ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    # static per-offset key deltas (window_conv.key_deltas of the TABLE
    # grid); all zeros for reverse plans, whose base IS the queried key
    dkeys: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    # conv window rows: strided FORWARD plans need ~2x (the parent table is
    # ~stride^d / 2 denser than the child query set, so per-tile match spans
    # approach 2*TILE_T).  REQUIRED (no default): an import-time snapshot
    # default silently ignored configure_tuning (ADVICE r3) — every builder
    # resolves the live tuning value and passes it explicitly.
    window_r: int = dataclasses.field(metadata=dict(static=True))
    # static query-row bound: tiles past it skip the kernel grid entirely
    # (None = full capacity).  Correct whenever n_active <= q_bound; the
    # engine surfaces max(n_active - q_bound, 0) via plan_overflow_dropped.
    q_bound: int | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    @property
    def num_offsets(self) -> int:
        return len(self.offsets)


def _compact_overflow(
    keys: jax.Array,  # [B, N_table]
    qkeys: jax.Array,  # [B, M, K]
    uncovered: jax.Array,  # i32[B, M, K]
    cap: int,
):
    """Resolve uncovered queries exactly -> compacted (src, dst, k) pairs.

    Compaction is sort-based: big XLA scatters serialize per source element
    on TPU (~68 ms for 1.35M rows -> 2048 slots, measured), while a sort of
    the same rows is ~27 ms and a sort of the composite below dominates the
    whole plan build.  Sorting ``flat_idx where uncovered else BIG`` packs
    the (rare) uncovered positions ascending at the front; the per-slot
    gathers that follow touch only ``cap`` rows.
    """
    b, m, k = qkeys.shape
    flat_q = qkeys.reshape(b, m * k)
    unc = (uncovered.reshape(b, m * k) != 0) & (flat_q != INVALID_QUERY)
    big = jnp.int32(2**30)
    flat_idx = jnp.arange(m * k, dtype=jnp.int32)[None, :]
    composite = jnp.where(unc, flat_idx, big)
    pos = jax.lax.sort(composite, dimension=1)[:, :cap]  # [B, cap]
    live = pos < big
    pos = jnp.where(live, pos, 0)
    q_ov = jnp.where(
        live, jnp.take_along_axis(flat_q, pos, axis=1), INVALID_QUERY
    )
    total = jnp.sum(unc.astype(jnp.int32), axis=1)
    dropped = jnp.maximum(total - cap, 0)
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
    q_bound: int | None = None,
    window_r: int | None = None,
) -> WindowPlan:
    """Plan for a submanifold conv (output sites == input sites)."""
    if window_r is None:
        window_r = window_r_default()
    offs = kernel_offsets(kernel_size, centered=True)
    qkeys = compute_query_keys(st, offs)
    keys = st.keys()
    pk, _ = _padded_table(keys, st.feats[..., :1])
    start, uncov = window_plan(pk, qkeys, st.n_active, interpret=interpret,
                               window_r=window_r, table_cap=st.capacity)
    src, dst, kk, valid, dropped = _compact_overflow(
        keys, qkeys, uncov, overflow_cap
    )
    return WindowPlan(
        compute_query_meta(st, offs), start, st.n_active, src, dst, kk,
        valid, dropped, offsets=tuple(map(tuple, offs.tolist())),
        dkeys=key_deltas(st.grid_shape, offs), window_r=window_r,
        q_bound=q_bound,
    )


def build_strided_window_plans(
    st: SparseTensor,
    skeleton: SparseTensor,
    stride,
    overflow_cap: int = 2048,
    interpret: bool = False,
    q_bound: int | None = None,
    rev_q_bound: int | None = None,
) -> Tuple[WindowPlan, WindowPlan]:
    """(forward, reverse) plans for a strided conv (filter == stride).

    forward: queries from output sites into the input table
             (q = out*stride + delta).
    reverse: one live column per INPUT row — its parent's key in the output
             table at the row's intra-cell offset (used for dX, dW)."""
    stride = tuple(int(s) for s in stride)
    offs = kernel_offsets(stride, centered=False)
    k = len(offs)
    # Resolve BOTH window sizes once so the window_plan() call and the
    # WindowPlan record can never disagree (ADVICE r3 high: the rev plan
    # used to call window_plan() with the import-time default while
    # recording the live window_r_default(), silently shrinking the kernel
    # window below what coverage assumed after configure_tuning).
    r_fwd = window_r_strided()
    r_rev = window_r_default()

    # forward queries (key-arithmetic form, no [B, N, K, 3] intermediate)
    qkeys_f = compute_strided_query_keys(
        skeleton, st.grid_shape, stride, offs
    )
    keys_in = st.keys()
    pk_in, _ = _padded_table(keys_in, st.feats[..., :1])
    start_f, uncov_f = window_plan(
        pk_in, qkeys_f, skeleton.n_active, interpret=interpret,
        window_r=r_fwd, table_cap=st.capacity,
    )
    src, dst, kk, val, drop = _compact_overflow(
        keys_in, qkeys_f, uncov_f, overflow_cap
    )
    fwd = WindowPlan(
        compute_strided_query_meta(skeleton, st.grid_shape, stride, offs),
        start_f, skeleton.n_active,
        src, dst, kk, val, drop,
        offsets=tuple(map(tuple, offs.tolist())),
        dkeys=key_deltas(st.grid_shape, offs),
        window_r=r_fwd, q_bound=q_bound,
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
    start_r, uncov_r = window_plan(
        pk_out, qkeys_r, st.n_active, interpret=interpret,
        window_r=r_rev, table_cap=skeleton.capacity,
    )
    src_r, dst_r, kk_r, val_r, drop_r = _compact_overflow(
        keys_out, qkeys_r, uncov_r, overflow_cap
    )
    rev = WindowPlan(
        compute_reverse_query_meta(st, skeleton, stride, k), start_r,
        st.n_active,
        src_r, dst_r, kk_r, val_r, drop_r,
        offsets=tuple(map(tuple, offs.tolist())), dkeys=(0,) * k,
        window_r=r_rev,
        q_bound=rev_q_bound,
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


def _use_batched_sidecar(c: int) -> bool:
    """v2 batched sidecars (window_sidecar) on hardware for C > 1; the
    serial v1 kernels remain for the C=1 initial conv (one-lane dots) and
    as the tuning.batched_sidecar=False / SEID_SIDECAR=serial bisect.
    Env is re-read per call (bench.py flips it mid-process on fallback)."""
    import os

    from .window_conv import TUNING

    if os.environ.get("SEID_SIDECAR") == "serial":
        return False
    if TUNING.batched_sidecar is False:
        return False
    return c != 1


def _apply_overflow_any(out, table, w, src, dst, kk, valid, interpret):
    """Pallas sidecar on hardware; the XLA twin in interpret mode (the XLA
    gather/one-hot/scatter formulation compiles pathologically slowly on TPU
    and destabilized jax.grad modules — see window_conv.overflow_apply)."""
    import os

    if os.environ.get("SEID_NO_SIDECAR") == "1":  # timing bisect only:
        return out                                # drops overflow pairs!
    if interpret:
        return _apply_overflow(out, table, w, src, dst, kk, valid)
    if _use_batched_sidecar(table.shape[-1]):
        from .window_conv import _ov_bound
        from .window_sidecar import batched_apply_fits, overflow_apply_batched

        wt = w.astype(table.dtype)
        if batched_apply_fits(out, table, wt, src):
            return overflow_apply_batched(
                out, table, wt, src, dst, kk, valid, _ov_bound(valid),
            )
        # geometry too large for the batched kernel's full-capacity VMEM
        # blocks (>126 MB scoped): the serial v1 walk handles any size
    return overflow_apply(
        out, table, w.astype(table.dtype), src, dst, kk, valid
    )


def _overflow_dw_any(x, gy, src, dst, kk, valid, k, interpret):
    import os

    if os.environ.get("SEID_NO_SIDECAR") == "1":  # timing bisect only
        import jax.numpy as _jnp

        return _jnp.zeros((k, x.shape[-1], gy.shape[-1]), _jnp.float32)
    if interpret:
        return _overflow_dw(x, gy, src, dst, kk, valid, k)
    if _use_batched_sidecar(x.shape[-1]):
        from .window_conv import _ov_bound
        from .window_sidecar import batched_dw_fits, overflow_dw_batched

        if batched_dw_fits(x, gy, k, src):
            return overflow_dw_batched(
                x, gy, k, src, dst, kk, valid, _ov_bound(valid)
            )
    return overflow_dw(x, gy, k, src, dst, kk, valid)


# --------------------------------------------------------------------------
# submanifold conv with custom VJP
# --------------------------------------------------------------------------

def _mirror_perm(offsets) -> np.ndarray:
    offs = np.asarray(offsets)
    lookup = {tuple(o): i for i, o in enumerate(offs.tolist())}
    return np.array([lookup[tuple(-np.asarray(o))] for o in offs.tolist()])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5, 6))
def _subm_window_conv(offsets, feats, w, interpret, window_r, q_bound,
                      dkeys,
                      keys, qmeta, start,
                      q_active, ov_src, ov_dst, ov_k, ov_valid):
    out = window_conv_apply(
        keys, feats, qmeta, start, w, q_active, dkeys, interpret=interpret,
        window_r=window_r, q_bound=q_bound,
    )
    return _apply_overflow_any(
        out, feats, w, ov_src, ov_dst, ov_k, ov_valid, interpret
    )


def _subm_fwd(offsets, feats, w, interpret, window_r, q_bound, dkeys,
              keys, qmeta, start,
              q_active, ov_src, ov_dst, ov_k, ov_valid):
    out = _subm_window_conv(
        offsets, feats, w, interpret, window_r, q_bound, dkeys,
        keys, qmeta, start,
        q_active, ov_src, ov_dst, ov_k, ov_valid,
    )
    return out, (feats, w, keys, qmeta, start, q_active,
                 ov_src, ov_dst, ov_k, ov_valid)


def _fused_bwd_ok(k: int, c: int, co: int) -> bool:
    """The fused one-compare-pass backward kernels need the CT orientation
    (C, CO sublane-tile multiples; the c==1 select path has no one-hot to
    share) and the G=1 batched-K formulation.  SEID_FUSED_BWD=0 bisects
    back to the separate dX / dW kernels.  Env is re-read per call —
    bench.py sets it mid-process as a crash fallback."""
    import os

    from .window_conv import TUNING, _group_size, _use_ct

    if os.environ.get("SEID_FUSED_BWD") == "0":
        return False
    if TUNING.fused_bwd is False:
        return False
    return (
        _group_size(k, c) == 1
        and c % 16 == 0
        and co % 16 == 0
        and _use_ct(c, co)
    )


def _subm_bwd(offsets, interpret, window_r, q_bound, dkeys, res, gy):
    (feats, w, keys, qmeta, start, q_active,
     ov_src, ov_dst, ov_k, ov_valid) = res
    k, c, co = w.shape
    perm_np = _mirror_perm(offsets)
    perm = jnp.asarray(perm_np)
    gy = gy.astype(feats.dtype)
    if _fused_bwd_ok(k, c, co):
        # One fused kernel gathers gy through the forward plan once and
        # emits BOTH cotangents (window_conv.window_bwd_subm — the strided
        # bwd kernel on mirrored pairs).  Both in-kernel pair sets are the
        # MIRROR images M(W) of the forward in-window set, so both sidecars
        # cover the twin complement M(O): for each forward overflow entry
        # (src, dst, kk) the missing pair is (dst <- src, perm[kk]),
        # contributing w_t[perm[kk]] @ gy[src] to dx[dst] and
        # x[dst] (x) gy[src] to dW[perm[kk]] — hence the swapped src/dst in
        # the dW sidecar and the final [perm] reorder of the mirrored dW.
        dx, dw_m = window_bwd_subm(
            keys, feats, gy, qmeta, start, w, q_active, perm_np,
            dkeys=dkeys,
            interpret=interpret, window_r=window_r, q_bound=q_bound,
        )
        w_t = jnp.transpose(w, (0, 2, 1))
        dx = _apply_overflow_any(
            dx, gy, w_t[perm_np], ov_src, ov_dst, ov_k, ov_valid, interpret
        )
        dw_m = dw_m + _overflow_dw_any(
            feats, gy, ov_dst, ov_src, ov_k, ov_valid, k, interpret
        )
        dw = dw_m[perm_np]
        return (dx, dw.astype(w.dtype)) + (None,) * 8
    # dX window pass: mirrored query columns, transposed weights.  Window
    # membership is NOT symmetric under mirroring: the mirrored pass covers
    # pair (a -> b, k) iff the forward window covered its TWIN (b -> a,
    # perm[k]).  The complement is therefore exactly the forward overflow
    # list, each entry (src=a, dst=b, kk) contributing the dX of its twin:
    #   dx[dst] += W[perm[kk]]^T @ gy[src]
    # i.e. the UNtransposed forward list with perm-permuted transposed
    # weights.  (Round 1 transposed the list instead, which double-counts
    # pairs whose twin was in-window — caught by the integer-exact on-TPU
    # equality check, scripts/check_window_tpu.py.)
    w_t = jnp.transpose(w, (0, 2, 1))
    dx = window_conv_apply(
        keys, gy, qmeta, start, w_t, q_active, dkeys,
        kmap=tuple(int(x) for x in perm_np),
        interpret=interpret, window_r=window_r, q_bound=q_bound,
    )
    dx = _apply_overflow_any(
        dx, gy, w_t[perm_np], ov_src, ov_dst, ov_k, ov_valid, interpret
    )
    # dW (+ forward-plan overflow pairs — the window part covers the
    # forward plan's in-window set, so the forward list is its complement).
    # Compiled path: fused gather+contract kernel (no [B, M, K*C] HBM
    # round-trip); interpret keeps the two-step formulation.
    if interpret:
        g = window_gather(keys, feats, qmeta, start, q_active, dkeys,
                          interpret=interpret, window_r=window_r)
        dw = jnp.einsum(
            "bnm,bno->mo", g.astype(jnp.float32), gy.astype(jnp.float32)
        ).reshape(k, c, co)
    else:
        dw = window_dw(keys, feats, qmeta, start, gy, q_active, dkeys,
                       window_r=window_r, q_bound=q_bound)
    dw = dw + _overflow_dw_any(
        feats, gy, ov_src, ov_dst, ov_k, ov_valid, k, interpret
    )
    return (dx, dw.astype(w.dtype)) + (None,) * 8


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
        plan.window_r, plan.q_bound, plan.dkeys,
        st.keys(), plan.qmeta, plan.start, plan.q_active,
        plan.ov_src, plan.ov_dst, plan.ov_k, plan.ov_valid,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    out = jnp.where(st.row_mask()[..., None], out, 0)
    return st.with_feats(out)


# --------------------------------------------------------------------------
# strided conv with custom VJP (forward plan + reverse plan)
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5, 6, 7, 8, 9))
def _strided_window_conv(offsets, feats, w, interpret, f_r, r_r, f_b, r_b,
                         f_dk, r_dk,
                         keys_in, keys_out,
                         fq, fs, f_act, fo_src, fo_dst, fo_k, fo_val,
                         rq, rs, r_act, ro_src, ro_dst, ro_k, ro_val):
    out = window_conv_apply(
        keys_in, feats, fq, fs, w, f_act, f_dk, interpret=interpret,
        window_r=f_r, q_bound=f_b,
    )
    return _apply_overflow_any(
        out, feats, w, fo_src, fo_dst, fo_k, fo_val, interpret
    )


def _strided_fwd(offsets, feats, w, interpret, f_r, r_r, f_b, r_b,
                 f_dk, r_dk,
                 keys_in, keys_out,
                 fq, fs, f_act, fo_src, fo_dst, fo_k, fo_val,
                 rq, rs, r_act, ro_src, ro_dst, ro_k, ro_val):
    out = _strided_window_conv(
        offsets, feats, w, interpret, f_r, r_r, f_b, r_b, f_dk, r_dk,
        keys_in, keys_out,
        fq, fs, f_act, fo_src, fo_dst, fo_k, fo_val,
        rq, rs, r_act, ro_src, ro_dst, ro_k, ro_val,
    )
    return out, (feats, w, keys_in, keys_out, fq, fs, f_act,
                 fo_src, fo_dst, fo_k, fo_val,
                 rq, rs, r_act, ro_src, ro_dst, ro_k, ro_val)


def _strided_bwd(offsets, interpret, f_r, r_r, f_b, r_b, f_dk, r_dk,
                 res, gy):
    (feats, w, keys_in, keys_out, fq, fs, f_act,
     fo_src, fo_dst, fo_k, fo_val,
     rq, rs, r_act, ro_src, ro_dst, ro_k, ro_val) = res
    k, c, co = w.shape
    gy = gy.astype(feats.dtype)
    w_t = jnp.transpose(w, (0, 2, 1))
    if _fused_bwd_ok(k, c, co):
        # dX and dW both walk the reverse plan over the same gy table;
        # the fused kernel gathers it once (window_conv._bwd_strided_kernel).
        dx, dw = window_bwd_strided(
            keys_out, gy, feats, rq, rs, w, r_act, dkeys=r_dk,
            interpret=interpret, window_r=r_r, q_bound=r_b,
        )
        dx = _apply_overflow_any(
            dx, gy, w_t, ro_src, ro_dst, ro_k, ro_val, interpret
        )
        dw = dw + _overflow_dw_any(
            feats, gy, ro_dst, ro_src, ro_k, ro_val, k, interpret
        )
        return (dx, dw.astype(w.dtype)) + (None,) * 16
    # dX via the reverse plan: each input row reads its parent's dY through
    # its own offset column.
    dx = window_conv_apply(
        keys_out, gy, rq, rs, w_t, r_act, r_dk, interpret=interpret,
        window_r=r_r, q_bound=r_b,
    )
    dx = _apply_overflow_any(
        dx, gy, w_t, ro_src, ro_dst, ro_k, ro_val, interpret
    )
    # dW via the reverse plan: g1[b, n_in, K*CO] = dY[parent] in the row's
    # offset column; dW[k] = sum_n x[n] (x) g1[n, k]. Compiled path: fused
    # kernel with (table=gy, cotangent=x) -> [K, CO, C], transposed.
    if interpret:
        g1 = window_gather(keys_out, gy, rq, rs, r_act, r_dk,
                           interpret=interpret, window_r=r_r)
        dw = jnp.einsum(
            "bnc,bnm->mc", feats.astype(jnp.float32), g1.astype(jnp.float32)
        ).reshape(k, co, c).transpose(0, 2, 1)
    else:
        dw = window_dw(keys_out, gy, rq, rs, feats, r_act, r_dk,
                       window_r=r_r, q_bound=r_b).transpose(0, 2, 1)
    dw = dw + _overflow_dw_any(
        feats, gy, ro_dst, ro_src, ro_k, ro_val, k, interpret
    )
    return (dx, dw.astype(w.dtype)) + (None,) * 16


_strided_window_conv.defvjp(_strided_fwd, _strided_bwd)


# --------------------------------------------------------------------------
# deconvolution (scn.Deconvolution, filter == stride): rides the SAME plans
# and kernels as the strided conv, transposed.  With plans built by
# build_strided_window_plans(st=target_fine, skeleton=coarse, stride):
#   * deconv FORWARD  == the strided conv's dX walk (reverse plan: each fine
#     row reads its parent coarse site through its intra-cell offset column),
#   * deconv dX_coarse == the strided conv's FORWARD walk (forward plan:
#     each coarse site gathers its fine children),
#   * deconv dW       == window_dw over the reverse plan with
#     (table=x_coarse, cotangent=gy_fine).
# Zero new Pallas kernels.  Reference semantics:
# /root/reference/src/networks/sparse_building_blocks.py:202-229.
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5, 6, 7, 8, 9))
def _deconv_window(offsets, x_coarse, w, interpret, f_r, r_r, f_b, r_b,
                   f_dk, r_dk,
                   keys_fine, keys_coarse,
                   fq, fs, f_act, fo_src, fo_dst, fo_k, fo_val,
                   rq, rs, r_act, ro_src, ro_dst, ro_k, ro_val):
    out = window_conv_apply(
        keys_coarse, x_coarse, rq, rs, w, r_act, r_dk, interpret=interpret,
        window_r=r_r, q_bound=r_b,
    )
    return _apply_overflow_any(
        out, x_coarse, w, ro_src, ro_dst, ro_k, ro_val, interpret
    )


def _deconv_fwd(offsets, x_coarse, w, interpret, f_r, r_r, f_b, r_b,
                f_dk, r_dk,
                keys_fine, keys_coarse,
                fq, fs, f_act, fo_src, fo_dst, fo_k, fo_val,
                rq, rs, r_act, ro_src, ro_dst, ro_k, ro_val):
    out = _deconv_window(
        offsets, x_coarse, w, interpret, f_r, r_r, f_b, r_b, f_dk, r_dk,
        keys_fine, keys_coarse,
        fq, fs, f_act, fo_src, fo_dst, fo_k, fo_val,
        rq, rs, r_act, ro_src, ro_dst, ro_k, ro_val,
    )
    return out, (x_coarse, w, keys_fine, keys_coarse,
                 fq, fs, f_act, fo_src, fo_dst, fo_k, fo_val,
                 rq, rs, r_act, ro_src, ro_dst, ro_k, ro_val)


def _deconv_bwd(offsets, interpret, f_r, r_r, f_b, r_b, f_dk, r_dk,
                res, gy):
    (x_coarse, w, keys_fine, keys_coarse,
     fq, fs, f_act, fo_src, fo_dst, fo_k, fo_val,
     rq, rs, r_act, ro_src, ro_dst, ro_k, ro_val) = res
    k, c, co = w.shape
    gy = gy.astype(x_coarse.dtype)
    w_t = jnp.transpose(w, (0, 2, 1))
    # dX_coarse: the strided conv's forward walk over gy at the fine sites
    dxc = window_conv_apply(
        keys_fine, gy, fq, fs, w_t, f_act, f_dk, interpret=interpret,
        window_r=f_r, q_bound=f_b,
    )
    dxc = _apply_overflow_any(
        dxc, gy, w_t, fo_src, fo_dst, fo_k, fo_val, interpret
    )
    # dW[k] = sum over pairs x_coarse[parent] (x) gy[fine]
    if interpret:
        g1 = window_gather(keys_coarse, x_coarse, rq, rs, r_act, r_dk,
                           interpret=interpret, window_r=r_r)
        dw = jnp.einsum(
            "bno,bnm->mo", gy.astype(jnp.float32), g1.astype(jnp.float32)
        ).reshape(k, c, co)
    else:
        dw = window_dw(keys_coarse, x_coarse, rq, rs, gy, r_act, r_dk,
                       window_r=r_r, q_bound=r_b)
    dw = dw + _overflow_dw_any(
        x_coarse, gy, ro_src, ro_dst, ro_k, ro_val, k, interpret
    )
    return (dxc, dw.astype(w.dtype)) + (None,) * 16


_deconv_window.defvjp(_deconv_fwd, _deconv_bwd)


def window_deconv(
    st_coarse: SparseTensor,
    target: SparseTensor,
    fwd_plan: WindowPlan,
    rev_plan: WindowPlan,
    w: jax.Array,
    interpret: bool = False,
) -> SparseTensor:
    """Drop-in for ops.deconv on the windowed engine.  ``fwd_plan`` /
    ``rev_plan`` come from build_strided_window_plans(target, st_coarse,
    stride) — note the argument order: the FINE site set plays the input
    role so the reverse plan walks fine->coarse (the deconv forward)."""
    out = _deconv_window(
        rev_plan.offsets, st_coarse.feats, w.astype(st_coarse.feats.dtype),
        interpret,
        fwd_plan.window_r, rev_plan.window_r,
        fwd_plan.q_bound, rev_plan.q_bound,
        fwd_plan.dkeys, rev_plan.dkeys,
        target.keys(), st_coarse.keys(),
        fwd_plan.qmeta, fwd_plan.start, fwd_plan.q_active,
        fwd_plan.ov_src, fwd_plan.ov_dst, fwd_plan.ov_k, fwd_plan.ov_valid,
        rev_plan.qmeta, rev_plan.start, rev_plan.q_active,
        rev_plan.ov_src, rev_plan.ov_dst, rev_plan.ov_k, rev_plan.ov_valid,
    )
    out = jnp.where(target.row_mask()[..., None], out, 0)
    return target.with_feats(out)


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
        fwd_plan.window_r, rev_plan.window_r,
        fwd_plan.q_bound, rev_plan.q_bound,
        fwd_plan.dkeys, rev_plan.dkeys,
        st.keys(), skeleton.keys(),
        fwd_plan.qmeta, fwd_plan.start, fwd_plan.q_active,
        fwd_plan.ov_src, fwd_plan.ov_dst, fwd_plan.ov_k, fwd_plan.ov_valid,
        rev_plan.qmeta, rev_plan.start, rev_plan.q_active,
        rev_plan.ov_src, rev_plan.ov_dst, rev_plan.ov_k, rev_plan.ov_valid,
    )
    out = jnp.where(skeleton.row_mask()[..., None], out, 0)
    return skeleton.with_feats(out)
