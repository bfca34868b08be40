"""Host IO engine loader: the C++ extension with a numpy fallback.

The native path (io/_hostio.cpp) does threaded event->padded-COO assembly,
normalization and augmentation with the GIL released — the role larcv3's
C++ BatchFillers play in the reference stack.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    from . import _hostio  # type: ignore

    HAVE_NATIVE = True
except ImportError:
    _hostio = None
    HAVE_NATIVE = False


def assemble_sparse_batch(
    events: List[Tuple[np.ndarray, np.ndarray]],
    max_voxels: int,
    dims: Sequence[int],
    normalize: bool = True,
    augment: bool = False,
    blur_sigma: float = 0.05,
    translate: Optional[Sequence[int]] = None,
    seed: int = 0,
) -> np.ndarray:
    """events: list of (linear ids u64[n], values f32[n]) ->
    [B, max_voxels, D+1] padded batch (-999 fill)."""
    if HAVE_NATIVE:
        return _hostio.assemble_sparse_batch(
            [(np.ascontiguousarray(i, np.uint64),
              np.ascontiguousarray(v, np.float32)) for i, v in events],
            int(max_voxels),
            tuple(int(d) for d in dims),
            normalize=bool(normalize),
            augment=bool(augment),
            blur_sigma=float(blur_sigma),
            translate=list(translate) if translate is not None else None,
            seed=int(seed),
        )
    return _assemble_numpy(
        events, max_voxels, dims, normalize, augment, blur_sigma, translate,
        seed,
    )


def build_window_plans(
    coords: np.ndarray,  # i32[B, cap0, 3], -1 padded (unsorted ok)
    grid: Sequence[int],
    caps: Sequence[int],
    initial_kernel: Sequence[int],
    series_kernel,  # (k0,k1,k2) or per-level [(k0,k1,k2)] * (depth+1)
    stride: Sequence[int],
    window_r: int,
    ov_caps: Sequence[int],
    ov_cap_initial: int,
    ov_caps_down: Sequence[int],
    window_r_down: int = 0,
    window_r_initial: int = 0,
    window_r_series: Sequence[int] | None = None,
) -> dict:
    """Threaded host-side site-pyramid + window-plan construction.

    Pure function of the input coordinates — the prefetch workers run this so
    the device never pays for plan kernels or overflow compaction (the role
    larcv3's C++ reader threads play in the reference, extended to the conv
    engine).  Geometry mirrors ops/pallas/window_conv.py exactly; see the
    C++ (io/_hostio.cpp build_window_plans).  Requires the native extension —
    the device-side plan builders are the fallback when it is absent.
    """
    if not HAVE_NATIVE:
        raise RuntimeError(
            "native _hostio extension unavailable; use the on-device plan "
            "builders (ops.engine) instead"
        )
    return _hostio.build_window_plans(
        np.ascontiguousarray(coords, np.int32),
        tuple(int(g) for g in grid),
        [int(c) for c in caps],
        tuple(int(k) for k in initial_kernel),
        (
            tuple(tuple(int(k) for k in kl) for kl in series_kernel)
            if hasattr(series_kernel[0], "__len__")
            else tuple(int(k) for k in series_kernel)
        ),
        tuple(int(s) for s in stride),
        int(window_r),
        [int(c) for c in ov_caps],
        int(ov_cap_initial),
        [int(c) for c in ov_caps_down],
        int(window_r_down),
        int(window_r_initial),
        (
            None
            if window_r_series is None
            else [int(r) for r in window_r_series]
        ),
    )


def _assemble_numpy(
    events, max_voxels, dims, normalize, augment, blur_sigma, translate, seed
) -> np.ndarray:
    b = len(events)
    d = len(dims)
    out = np.full((b, max_voxels, d + 1), -999.0, np.float32)
    dims_arr = np.asarray(dims, np.int64)
    for bi, (ids, vals) in enumerate(events):
        ids = np.asarray(ids, np.uint64)
        vals = np.asarray(vals, np.float32)
        if normalize and len(vals) > 1:
            mu, sd = vals.mean(), vals.std() + 1e-6
            vals = (vals - mu) / sd * 0.5 + 1.0
        coords = np.empty((len(ids), d), np.int64)
        rem = ids.astype(np.int64)
        for dd in range(d - 1, 0, -1):
            coords[:, dd] = rem % dims_arr[dd]
            rem = rem // dims_arr[dd]
        coords[:, 0] = rem
        if augment:
            rng = np.random.default_rng((seed, bi))
            for dd in range(d):
                if rng.random() < 0.5:
                    coords[:, dd] = dims_arr[dd] - 1 - coords[:, dd]
            if blur_sigma > 0:
                coords = np.rint(
                    coords + rng.normal(scale=blur_sigma, size=coords.shape)
                ).astype(np.int64)
            if translate is not None:
                shift = np.array(
                    [rng.integers(-t, t + 1) for t in translate[:d]]
                )
                coords = coords + shift
            ok = np.all((coords >= 0) & (coords < dims_arr), axis=1)
            coords, vals = coords[ok], vals[ok]
        k = min(len(coords), max_voxels)
        out[bi, :k, :d] = coords[:k]
        out[bi, :k, d] = vals[:k]
    return out
