"""Host-side format transforms: larcv padded batches -> model inputs.

Equivalent of /root/reference/src/io/data_transforms.py
(larcvsparse_to_scnsparse_{2d,3d}, ..._to_dense, pointcloud transforms), but
emitting the fixed-capacity batched COO layout of ops.SparseTensor instead of
the flat scn tuple — the padding never leaves, keeping shapes static for XLA.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import SparseTensor, build_sparse_tensor


def larcv_batch_to_sparse_3d(
    image: np.ndarray, image_size: Tuple[int, ...],
    capacity: int | None = None,
) -> SparseTensor:
    """[B, MaxVoxels, D+1] padded with -999 -> SparseTensor.

    Mirrors larcvsparse_to_scnsparse_3d (data_transforms.py:21-49) minus the
    densify: coords stay padded at fixed capacity, batch index is implicit in
    the [B, N, ...] layout.
    """
    coords = image[..., :-1]
    vals = image[..., -1:]
    valid = np.all(coords != -999.0, axis=-1) & (vals[..., 0] != -999.0)
    coords_i = np.where(valid[..., None], coords, -1).astype(np.int32)
    feats = np.where(valid[..., None], vals, 0).astype(np.float32)
    return build_sparse_tensor(
        jnp.asarray(coords_i), jnp.asarray(feats), tuple(image_size),
        capacity=capacity,
    )


def larcv_batch_to_sparse_2d(
    image: np.ndarray, image_size: Tuple[int, ...],
    capacity: int | None = None,
) -> SparseTensor:
    """[B, planes, MaxVoxels, 3] (x, y, val) -> plane-axis 3D SparseTensor.

    The 2D multiplane encoding (data_transforms.py:198-252 + resnet.py:26-36):
    plane index becomes coordinate 0 on a (n_planes, H, W) grid. The
    reference's coordinate order is pinned at data_transforms.py:242:
    ``numpy.stack([p, y, x, batch])`` from stored (x, y, value) — i.e. the
    SECOND stored coordinate maps to spatial axis 1 and the FIRST to axis 2
    (tests/test_io.py pins this contract).
    """
    b, planes, n, _ = image.shape
    xy = image[..., :2]
    vals = image[..., 2:3]
    valid = np.all(xy != -999.0, axis=-1) & (vals[..., 0] != -999.0)
    plane_idx = np.broadcast_to(
        np.arange(planes, dtype=np.int32)[None, :, None], (b, planes, n)
    )
    yx = xy[..., ::-1]  # stored (x, y) -> coords (y, x)
    coords3 = np.concatenate(
        [plane_idx[..., None], yx.astype(np.int32)], axis=-1
    )  # [B, P, N, 3]
    # drop pixels outside the declared grid (matches scn's behavior of
    # never creating out-of-spatial sites)
    h, w = int(image_size[1]), int(image_size[2])
    in_grid = (
        (yx[..., 0] >= 0) & (yx[..., 0] < h)
        & (yx[..., 1] >= 0) & (yx[..., 1] < w)
    )
    valid = valid & in_grid
    coords3 = np.where(valid[..., None], coords3, -1).reshape(b, planes * n, 3)
    feats = np.where(valid[..., None], vals, 0).astype(np.float32)
    feats = feats.reshape(b, planes * n, 1)
    return build_sparse_tensor(
        jnp.asarray(coords3), jnp.asarray(feats), tuple(image_size),
        capacity=capacity,
    )


def larcv_batch_to_dense(
    image: np.ndarray, image_size: Tuple[int, ...]
) -> np.ndarray:
    """[B, MaxVoxels, D+1] -> dense [B, *image_size, 1] (channels-last,
    the TPU-native layout; reference uses NCHW at data_transforms.py:53-81)."""
    b = image.shape[0]
    out = np.zeros((b, *image_size, 1), np.float32)
    coords = image[..., :-1]
    vals = image[..., -1]
    valid = np.all(coords != -999.0, axis=-1) & (vals != -999.0)
    for bi in range(b):
        c = coords[bi][valid[bi]].astype(np.int64)
        v = vals[bi][valid[bi]]
        out[(bi, *c.T, 0)] = v
    return out


def larcv_batch_to_pointcloud(
    image: np.ndarray, max_points: int, shuffle_rng: np.random.Generator | None = None
) -> Tuple[np.ndarray, np.ndarray]:
    """[B, MaxVoxels, D+1] -> ([B, max_points, D+1] float points, mask)
    for PointNet/DGCNN (legacy data_transforms.py:195-250 contract: point
    features are (coords..., value))."""
    b, n, f = image.shape
    pts = np.zeros((b, max_points, f), np.float32)
    mask = np.zeros((b, max_points), bool)
    coords = image[..., :-1]
    valid = np.all(coords != -999.0, axis=-1)
    for bi in range(b):
        idx = np.nonzero(valid[bi])[0]
        if shuffle_rng is not None and len(idx) > max_points:
            idx = shuffle_rng.choice(idx, max_points, replace=False)
        else:
            idx = idx[:max_points]
        k = len(idx)
        pts[bi, :k] = image[bi, idx]
        mask[bi, :k] = True
    return pts, mask
