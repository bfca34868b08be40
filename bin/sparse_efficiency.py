#!/usr/bin/env python
"""Sparse-vs-dense conv kernel sweep — parity with
/root/reference/bin/sparse_efficiency.py:11-160: times the sparse engine
against XLA dense convolution for dim in {2,3}, kernel in {1,3,5}, sparsity
over a log range, and writes a pandas CSV.

Usage: python bin/sparse_efficiency.py [--out sparse_efficiency.csv]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, iters=5):
    out = fn(*args)
    _ = float(jnp.sum(out))  # fence (block_until_ready is a no-op on axon)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def sweep(dims=(2, 3), kernels=(1, 3, 5), sparsities=None, size=256, cap=65536):
    from sparseeventid_tpu import ops
    from sparseeventid_tpu.ops.engine import (
        WINDOW, XLA, apply_submanifold, build_series_plan,
    )

    if sparsities is None:
        sparsities = np.logspace(-4, -1.5, 6)
    rng = np.random.default_rng(0)
    rows = []
    backend = WINDOW if jax.default_backend() == "tpu" else XLA
    for dim in dims:
        grid = (size,) * dim
        total = int(np.prod(grid))
        for sparsity in sparsities:
            n = min(cap, max(8, int(total * sparsity)))
            lin = rng.choice(total, n, replace=False).astype(np.int64)
            coords = np.stack(np.unravel_index(lin, grid), -1).astype(np.int32)
            cpad = np.full((1, cap, dim), -1, np.int32)
            cpad[0, :n] = coords
            feats = np.zeros((1, cap, 8), np.float32)
            feats[0, :n] = rng.standard_normal((n, 8))
            st = ops.build_sparse_tensor(
                jnp.asarray(cpad), jnp.asarray(feats), grid
            )
            dense = jnp.asarray(ops.to_dense(st))
            for k in kernels:
                ksz = (k,) * dim
                w = jnp.asarray(
                    rng.standard_normal((k**dim, 8, 8)).astype(np.float32)
                )
                if k == 1:
                    sparse_t = time_fn(
                        jax.jit(lambda f, ww: jnp.einsum("bnc,co->bno", f, ww[0])),
                        st.feats, w,
                    )
                else:
                    plan = jax.jit(
                        lambda s: build_series_plan(s, ksz, backend=backend)
                    )(st)
                    sparse_t = time_fn(
                        jax.jit(
                            lambda f, p, ww: apply_submanifold(
                                st.with_feats(f), p, ww
                            ).feats
                        ),
                        st.feats, plan, w,
                    )
                wd = jnp.asarray(
                    rng.standard_normal((*ksz, 8, 8)).astype(np.float32) * 0.1
                )
                dense_t = time_fn(
                    jax.jit(
                        lambda x, ww: jax.lax.conv_general_dilated(
                            x, ww, (1,) * dim, "SAME",
                            dimension_numbers=(
                                ("NHWC", "HWIO", "NHWC")
                                if dim == 2
                                else ("NDHWC", "DHWIO", "NDHWC")
                            ),
                        )
                    ),
                    dense, wd,
                )
                rows.append(
                    dict(
                        dim=dim, kernel=k, sparsity=float(sparsity), nnz=n,
                        sparse_ms=sparse_t * 1e3, dense_ms=dense_t * 1e3,
                        speedup=dense_t / sparse_t,
                    )
                )
                print(rows[-1], flush=True)
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="sparse_efficiency.csv")
    parser.add_argument("--size", type=int, default=256)
    args = parser.parse_args()
    rows = sweep(size=args.size)
    import pandas as pd

    pd.DataFrame(rows).to_csv(args.out, index=False)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
