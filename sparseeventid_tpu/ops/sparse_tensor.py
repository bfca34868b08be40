"""Fixed-capacity batched COO sparse tensor — the TPU-native replacement for
SparseConvNet's metadata/SparseConvNetTensor (reference: scn.InputLayer usage at
/root/reference/src/networks/resnet.py:26-50 and the scn tuple format produced by
/root/reference/src/io/data_transforms.py:21-49).

Design (TPU-first):
  * Every shape is static: per-event voxel capacity ``N`` is fixed per pyramid
    level (the reference caps events at MaxVoxels=50000,
    /root/reference/src/io/larcv_fetcher.py:116).
  * ``coords`` are kept **sorted by linearized spatial key** with inactive rows
    (sentinel ``-1`` coords / ``INVALID_KEY``) packed at the end.  This sorted
    invariant is what lets rulebook construction use ``searchsorted`` instead of
    the hash tables SCN builds in C++ — sorts and binary searches are
    XLA-friendly; pointer-chasing hash maps are not.
  * Batched layout ``[B, N, ...]``: the per-event spatial key always fits in
    int32 (dune3d grid 1024*512*1280 = 6.7e8 < 2**31), so no int64 is needed.

The pytree is registered via a NamedTuple-style dataclass so it moves through
``jit`` / ``shard_map`` / ``vmap`` transparently; ``grid_shape`` is static
metadata (aux data), not a traced leaf.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel linear key for inactive (padding) rows. Chosen as int32 max so that
# an ascending sort packs padding after every real site.
INVALID_KEY = np.int32(2**31 - 1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseTensor:
    """Batched fixed-capacity COO tensor.

    Attributes:
      coords:   i32[B, N, D]   voxel coordinates; ``-1`` rows are padding.
                Rows are sorted ascending by ``linearize(coords)`` with padding
                (key = INVALID_KEY) last.
      feats:    f32/bf16[B, N, C] features; zero at padding rows.
      n_active: i32[B]         number of live rows per batch element.
      grid_shape: static tuple — the spatial extent per dimension.
    """

    coords: jax.Array
    feats: jax.Array
    n_active: jax.Array
    grid_shape: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))

    # ---- static shape helpers -------------------------------------------------
    @property
    def batch_size(self) -> int:
        return self.coords.shape[0]

    @property
    def capacity(self) -> int:
        return self.coords.shape[1]

    @property
    def ndim_spatial(self) -> int:
        return self.coords.shape[2]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[2]

    # ---- masks and keys -------------------------------------------------------
    def row_mask(self) -> jax.Array:
        """bool[B, N] — True at live rows (relies on the sorted invariant)."""
        idx = jnp.arange(self.capacity, dtype=jnp.int32)[None, :]
        return idx < self.n_active[:, None]

    def keys(self) -> jax.Array:
        """i32[B, N] linearized spatial keys (INVALID_KEY at padding)."""
        return linearize(self.coords, self.grid_shape)

    def with_feats(self, feats: jax.Array) -> "SparseTensor":
        """Same site set, new features (the submanifold-conv contract)."""
        return SparseTensor(self.coords, feats, self.n_active, self.grid_shape)


def linearize(coords: jax.Array, grid_shape: Tuple[int, ...]) -> jax.Array:
    """Row-major linear key per coordinate; INVALID_KEY where any coord < 0.

    grid must satisfy prod(grid_shape) < 2**31 (checked at trace time).
    """
    total = int(np.prod(grid_shape))
    if total >= 2**31:
        raise ValueError(f"grid {grid_shape} overflows int32 linearization")
    key = coords[..., 0].astype(jnp.int32)
    for d in range(1, len(grid_shape)):
        key = key * np.int32(grid_shape[d]) + coords[..., d].astype(jnp.int32)
    invalid = jnp.any(coords < 0, axis=-1)
    return jnp.where(invalid, INVALID_KEY, key)


def unlinearize(keys: jax.Array, grid_shape: Tuple[int, ...]) -> jax.Array:
    """Inverse of :func:`linearize`; padding keys decode to -1 coords."""
    out = []
    rem = keys
    for d in range(len(grid_shape) - 1, 0, -1):
        out.append(rem % np.int32(grid_shape[d]))
        rem = rem // np.int32(grid_shape[d])
    out.append(rem)
    coords = jnp.stack(out[::-1], axis=-1)
    invalid = (keys == INVALID_KEY)[..., None]
    return jnp.where(invalid, jnp.int32(-1), coords)


def build_sparse_tensor(
    coords: jax.Array,
    feats: jax.Array,
    grid_shape: Tuple[int, ...],
    valid: jax.Array | None = None,
    capacity: int | None = None,
) -> SparseTensor:
    """Construct a :class:`SparseTensor` from unsorted batched COO data.

    Args:
      coords: i32[B, N, D]; padding rows must have a negative coordinate
        (the larcv fill value -999 maps here, cf.
        /root/reference/src/io/data_transforms.py:28 ``!= -999`` test).
      feats:  [B, N, C] features (any value at padding rows; zeroed here).
      valid:  optional bool[B, N] overriding the coords<0 padding detection.
      capacity: optional row capacity >= N to pad to — level-0 capacities
        are GRID_QUANTUM-aligned (models/encoder.py) so the window kernels
        see exactly-shaped query/table arrays; padding ONCE here replaces a
        pad per conv downstream.

    Sorts rows per batch element by linear key, packs padding last, dedups
    nothing (input sites are assumed unique, as larcv guarantees).
    """
    coords = coords.astype(jnp.int32)
    if capacity is not None and capacity > coords.shape[1]:
        extra = capacity - coords.shape[1]
        pad3 = ((0, 0), (0, extra), (0, 0))
        coords = jnp.pad(coords, pad3, constant_values=-1)
        feats = jnp.pad(feats, pad3)
        if valid is not None:
            valid = jnp.pad(valid, ((0, 0), (0, extra)))
    key = linearize(coords, grid_shape)
    if valid is not None:
        key = jnp.where(valid, key, INVALID_KEY)
    order = jnp.argsort(key, axis=-1)
    key_sorted = jnp.take_along_axis(key, order, axis=-1)
    coords_sorted = jnp.take_along_axis(coords, order[..., None], axis=1)
    feats_sorted = jnp.take_along_axis(feats, order[..., None], axis=1)
    live = key_sorted != INVALID_KEY
    n_active = jnp.sum(live, axis=-1).astype(jnp.int32)
    feats_sorted = jnp.where(live[..., None], feats_sorted, 0)
    coords_sorted = jnp.where(live[..., None], coords_sorted, -1)
    return SparseTensor(coords_sorted, feats_sorted, n_active, tuple(grid_shape))


def from_dense(dense: jax.Array, capacity: int, grid_shape=None) -> SparseTensor:
    """Testing helper: dense [B, *grid, C] -> SparseTensor (sites = nonzero)."""
    if grid_shape is None:
        grid_shape = dense.shape[1:-1]
    b = dense.shape[0]
    d = len(grid_shape)
    flat = dense.reshape(b, -1, dense.shape[-1])
    nz = jnp.any(flat != 0, axis=-1)  # [B, prod]
    # top-`capacity` nonzero positions per batch element
    keys = jnp.where(nz, jnp.arange(flat.shape[1], dtype=jnp.int32)[None, :], INVALID_KEY)
    keys = jnp.sort(keys, axis=-1)[:, :capacity]
    coords = unlinearize(keys, tuple(grid_shape))
    feats = jax.vmap(lambda f, k: f[jnp.clip(k, 0, flat.shape[1] - 1)])(flat, keys)
    live = keys != INVALID_KEY
    feats = jnp.where(live[..., None], feats, 0)
    return SparseTensor(coords, feats, jnp.sum(live, -1).astype(jnp.int32), tuple(grid_shape))


def to_dense(st: SparseTensor) -> jax.Array:
    """SparseToDense (reference scn.SparseToDense at resnet.py:122-128).

    Returns [B, *grid_shape, C] (channels-last; NHWC is the TPU-native layout,
    unlike torch's NCHW).
    """
    b, n, _ = st.coords.shape
    c = st.num_channels
    total = int(np.prod(st.grid_shape))
    key = st.keys()
    mask = st.row_mask()
    safe = jnp.where(mask, key, total)  # scatter-drop slot

    def scatter_one(keys_b, feats_b):
        out = jnp.zeros((total, c), dtype=st.feats.dtype)
        return out.at[keys_b].add(feats_b, mode="drop")

    dense = jax.vmap(scatter_one)(safe, jnp.where(mask[..., None], st.feats, 0))
    return dense.reshape((b, *st.grid_shape, c))
