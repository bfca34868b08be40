"""Rulebook construction — the TPU-native replacement for SparseConvNet's
C++/sparsehash rulebook (used implicitly by every scn.*Convolution in
/root/reference/src/networks/sparse_building_blocks.py).

SCN builds, per kernel offset, the list of (input_row, output_row) pairs using
hash tables on the host/GPU.  Here the site set is kept sorted by linearized
key (see sparse_tensor.py), so for a *submanifold* convolution the rulebook is
simply, for every output row and kernel offset delta:

    neighbor_idx[b, n, k] = binary_search(keys[b], linearize(coords[b,n]+delta))
    hit[b, n, k]          = found and in-bounds

Because submanifold convolutions have output sites == input sites
(Graham & van der Maaten, arXiv:1706.01307), each (site, offset) has at most
one partner — the rulebook is a dense [B, N, K] gather table with a miss mask.
That gives fully static shapes (XLA requirement) and turns the sparse conv
into gather + one dense GEMM (see conv.py).

Strided (downsampling) convolutions build a *new* site set = unique(coords //
stride) (scn.Convolution filter_size=stride=2, sparse_building_blocks.py:110)
and then the same searchsorted lookup maps each output site x offset back to
the parent rows.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sparse_tensor import (
    INVALID_KEY,
    SparseTensor,
    linearize,
    unlinearize,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Rulebook:
    """Gather table for one convolution over a fixed site set.

    neighbor_idx: i32[B, N, K] — row index into the *input* tensor per output
                  row and kernel offset (0 where miss; masked by ``hit``).
    hit:          bool[B, N, K]
    offsets:      static (K, D) numpy array of kernel offsets (row-major order
                  matching the weight layout W[K, Cin, Cout]).
    """

    neighbor_idx: jax.Array
    hit: jax.Array
    offsets: Tuple[Tuple[int, ...], ...] = dataclasses.field(metadata=dict(static=True))

    @property
    def num_offsets(self) -> int:
        return self.neighbor_idx.shape[2]


def kernel_offsets(kernel_size: Sequence[int], centered: bool = True) -> np.ndarray:
    """Enumerate kernel offsets in row-major order.

    centered=True: offsets span [-(k//2), k//2] per dim (odd submanifold
    kernels).  centered=False: offsets span [0, k) (strided downsample, where
    output site o covers inputs at o*stride + delta).
    """
    ranges = []
    for k in kernel_size:
        if centered:
            if k % 2 != 1:
                raise ValueError("submanifold kernels must be odd")
            ranges.append(range(-(k // 2), k // 2 + 1))
        else:
            ranges.append(range(k))
    return np.array(list(itertools.product(*ranges)), dtype=np.int32)


def _lookup(
    sorted_keys: jax.Array,  # i32[B, N] ascending, INVALID_KEY padding
    query_keys: jax.Array,  # i32[B, M]
) -> Tuple[jax.Array, jax.Array]:
    """Batched binary search. Returns (idx i32[B, M], hit bool[B, M])."""

    def one(keys_b, q_b):
        pos = jnp.searchsorted(keys_b, q_b, side="left")
        pos = jnp.clip(pos, 0, keys_b.shape[0] - 1)
        found = (keys_b[pos] == q_b) & (q_b != INVALID_KEY)
        return pos.astype(jnp.int32), found

    return jax.vmap(one)(sorted_keys, query_keys)


def _query_keys_for_offset(
    coords: jax.Array,  # i32[B, N, D]
    row_mask: jax.Array,  # bool[B, N]
    offset: np.ndarray,  # (D,)
    scale: Sequence[int] | None,
    grid_shape: Tuple[int, ...],
) -> jax.Array:
    """Linear keys of (coords*scale + offset), INVALID where out of bounds."""
    q = coords
    if scale is not None:
        q = q * jnp.asarray(scale, dtype=jnp.int32)
    q = q + jnp.asarray(offset, dtype=jnp.int32)
    in_bounds = jnp.all(
        (q >= 0) & (q < jnp.asarray(grid_shape, dtype=jnp.int32)), axis=-1
    )
    keys = linearize(q, grid_shape)
    return jnp.where(in_bounds & row_mask, keys, INVALID_KEY)


def build_submanifold_rulebook(
    st: SparseTensor, kernel_size: Sequence[int]
) -> Rulebook:
    """Rulebook for a submanifold conv: output sites == input sites.

    Submanifold block series share the site set, so one rulebook serves every
    conv in a BlockSeries (SCN caches this in its metadata object; we make the
    reuse explicit — cf. SURVEY.md §7.4 item 2).
    """
    offs = kernel_offsets(kernel_size, centered=True)
    keys = st.keys()
    mask = st.row_mask()
    b, n, _ = st.coords.shape
    k = offs.shape[0]

    # Batch all K offsets into ONE searchsorted call of [B, N*K] queries —
    # fewer, larger ops for XLA.
    q = st.coords[:, :, None, :] + jnp.asarray(offs, jnp.int32)[None, None, :, :]
    in_bounds = jnp.all(
        (q >= 0) & (q < jnp.asarray(st.grid_shape, jnp.int32)), axis=-1
    )
    qk = linearize(q, st.grid_shape)
    qk = jnp.where(in_bounds & mask[:, :, None], qk, INVALID_KEY)
    idx, hit = _lookup(keys, qk.reshape(b, n * k))
    return Rulebook(
        idx.reshape(b, n, k),
        hit.reshape(b, n, k),
        offsets=tuple(map(tuple, offs.tolist())),
    )


def downsample_sites(
    st: SparseTensor,
    stride: Sequence[int],
    out_capacity: int | None = None,
    with_dropped: bool = False,
):
    """New site set for a strided conv: unique(coords // stride) on a grid of
    ceil(grid/stride) (scn.Convolution semantics,
    sparse_building_blocks.py:103-139).  Output capacity defaults to the
    input capacity; if the unique count overflows, the highest-key sites are
    dropped (the reference's C++ filler silently truncates at MaxVoxels too —
    SURVEY.md §7.4 item 1).  Returns a skeleton with zero-width feats; with
    ``with_dropped`` also the per-event count of unique sites lost to the
    static capacity (surfaced as a train-step metric so truncation is never
    silent — VERDICT r1 'What's weak' #4).
    """
    stride = tuple(int(s) for s in stride)
    new_grid = tuple(-(-g // s) for g, s in zip(st.grid_shape, stride))
    n_out_cap = out_capacity or st.capacity
    mask = st.row_mask()

    child = st.coords // jnp.asarray(stride, jnp.int32)
    child_keys = linearize(child, new_grid)
    child_keys = jnp.where(mask, child_keys, INVALID_KEY)

    def unique_one(keys_b):
        # sort-based unique-compaction: XLA scatters serialize per element on
        # TPU, a second small sort does not (measured in the window-plan
        # compaction rewrite, window_engine._compact_overflow).
        sk = jnp.sort(keys_b)
        first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
        first = first & (sk != INVALID_KEY)
        out = jnp.sort(jnp.where(first, sk, INVALID_KEY))[:n_out_cap]
        total = jnp.sum(first).astype(jnp.int32)
        n = jnp.minimum(total, n_out_cap).astype(jnp.int32)
        return out, n, jnp.maximum(total - n_out_cap, 0)

    out_keys, n_out, dropped = jax.vmap(unique_one)(child_keys)
    out_coords = unlinearize(out_keys, new_grid)
    skeleton = SparseTensor(
        coords=out_coords,
        feats=jnp.zeros((st.coords.shape[0], n_out_cap, 0), dtype=st.feats.dtype),
        n_active=n_out,
        grid_shape=new_grid,
    )
    if with_dropped:
        return skeleton, dropped
    return skeleton


def build_downsample_rulebook(
    st: SparseTensor, skeleton: SparseTensor, stride: Sequence[int]
) -> Rulebook:
    """Gather table: out_site * stride + delta looked up in the parent keys."""
    stride = tuple(int(s) for s in stride)
    offs = kernel_offsets(stride, centered=False)
    k = offs.shape[0]
    b = st.coords.shape[0]
    n_out_cap = skeleton.capacity
    out_mask = skeleton.row_mask()
    q = (
        skeleton.coords[:, :, None, :] * jnp.asarray(stride, jnp.int32)
        + jnp.asarray(offs, jnp.int32)[None, None, :, :]
    )
    in_bounds = jnp.all(
        (q >= 0) & (q < jnp.asarray(st.grid_shape, jnp.int32)), axis=-1
    )
    qk = linearize(q, st.grid_shape)
    qk = jnp.where(in_bounds & out_mask[:, :, None], qk, INVALID_KEY)
    idx, hit = _lookup(st.keys(), qk.reshape(b, n_out_cap * k))
    return Rulebook(
        idx.reshape(b, n_out_cap, k),
        hit.reshape(b, n_out_cap, k),
        offsets=tuple(map(tuple, offs.tolist())),
    )


def build_downsample(
    st: SparseTensor,
    stride: Sequence[int],
    out_capacity: int | None = None,
) -> Tuple[SparseTensor, Rulebook]:
    """Site set + rulebook for a strided conv (filter == stride)."""
    skeleton = downsample_sites(st, stride, out_capacity)
    return skeleton, build_downsample_rulebook(st, skeleton, stride)


def build_upsample(
    st_coarse: SparseTensor,
    target: SparseTensor,
    stride: Sequence[int],
) -> Rulebook:
    """Rulebook for scn.Deconvolution (filter == stride == 2): each *target*
    (fine) site t reads coarse site t // stride through the weight slice for
    offset t % stride (sparse_building_blocks.py:202-229).  The target site
    set must be supplied (SCN replays the cached finer-level site set).

    Returned rulebook has K = prod(stride) but each target row has exactly one
    live offset — kept padded for a uniform conv path.
    """
    stride_arr = jnp.asarray([int(s) for s in stride], jnp.int32)
    offs = kernel_offsets(stride, centered=False)
    k = offs.shape[0]
    b, n, _ = target.coords.shape
    mask = target.row_mask()

    parent = target.coords // stride_arr
    rem = target.coords - parent * stride_arr  # which offset this site is
    pkeys = linearize(parent, st_coarse.grid_shape)
    pkeys = jnp.where(mask, pkeys, INVALID_KEY)
    idx, hit = _lookup(st_coarse.keys(), pkeys)

    # one-hot the offset slot: off_id = row-major index of rem
    off_id = rem[..., 0]
    for d in range(1, rem.shape[-1]):
        off_id = off_id * np.int32(stride[d]) + rem[..., d]
    slot = jax.nn.one_hot(off_id, k, dtype=jnp.bool_)  # [B, N, K]
    return Rulebook(
        jnp.broadcast_to(idx[:, :, None], (b, n, k)).astype(jnp.int32),
        slot & hit[:, :, None] & mask[:, :, None],
        offsets=tuple(map(tuple, offs.tolist())),
    )
