#!/usr/bin/env python
"""On-TPU equality check for 2D-multiplane host-built plans, including the
plane-merge topology: per-level series kernels ([1,3,3] shared-plane at
level 0, [3,3,3] cross-plane from plane_merge_depth=1) built by the C++
build_window_plans against the XLA rulebook backend.

Integer-valued data makes bf16 MXU passes exact (check_window_tpu.py), so
any nonzero difference is a plan bug."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparseeventid_tpu import ops
from sparseeventid_tpu.io.hostio import HAVE_NATIVE, build_window_plans
from sparseeventid_tpu.ops import engine
from sparseeventid_tpu.ops.host_plans import encoder_plans_from_host
from sparseeventid_tpu.ops.conv import strided_conv, submanifold_conv
from sparseeventid_tpu.ops.rulebook import (
    build_downsample_rulebook,
    build_submanifold_rulebook,
    downsample_sites,
)
from sparseeventid_tpu.ops.pallas.window_engine import (
    window_strided_conv,
    window_submanifold_conv,
)

GRID = (3, 512, 384)  # plane-axis 2D multiplane grid
BATCH = 4
CAP = 12000
ACTIVE_PER_PLANE = 3000
DEPTH = 2
SERIES_KERNELS = ((1, 3, 3), (3, 3, 3), (3, 3, 3))  # plane_merge_depth=1
INITIAL_KERNEL = (1, 5, 5)
STRIDE = (1, 2, 2)


def make_st(seed, c):
    r = np.random.default_rng(seed)
    coords = np.full((BATCH, CAP, 3), -1, np.int32)
    for b in range(BATCH):
        pts = []
        for plane in range(3):
            per = ACTIVE_PER_PLANE // 10
            for t in range(10):
                start = r.uniform(0.2, 0.8, 2) * np.array(GRID[1:])
                d = r.normal(size=2)
                d /= np.linalg.norm(d)
                steps = np.arange(per)[:, None] * d[None, :] * 1.5
                yx = start[None, :] + steps + r.normal(scale=0.5, size=(per, 2))
                np.clip(yx, 0, np.array(GRID[1:]) - 1, out=yx)
                p = np.concatenate(
                    [np.full((per, 1), plane, np.float64), yx], axis=1
                )
                pts.append(p)
        cc = np.unique(np.concatenate(pts).astype(np.int32), axis=0)
        coords[b, : min(len(cc), CAP)] = cc[:CAP]
    feats = r.integers(-3, 4, (BATCH, CAP, c)).astype(np.float32)
    st = ops.build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats), GRID)
    return st, coords


def main():
    assert HAVE_NATIVE, "native _hostio extension required"
    c = 16
    st, raw_coords = make_st(0, c)
    r = np.random.default_rng(1)
    caps = [CAP]
    for _ in range(DEPTH):
        caps.append(max(1024, caps[-1] // 2))

    host = build_window_plans(
        raw_coords, GRID, caps,
        initial_kernel=INITIAL_KERNEL, series_kernel=SERIES_KERNELS,
        stride=STRIDE, window_r=176,
        ov_caps=[
            engine._overflow_cap(cc, int(np.prod(sk)))
            for cc, sk in zip(caps, SERIES_KERNELS)
        ],
        ov_cap_initial=engine._overflow_cap(caps[0], int(np.prod(INITIAL_KERNEL))),
        ov_caps_down=[
            engine._overflow_cap(cc, int(np.prod(STRIDE))) for cc in caps[:-1]
        ],
        window_r_down=320,
    )
    host_j = {k: jnp.asarray(v) for k, v in host.items()}
    plans = jax.jit(
        lambda s, h: encoder_plans_from_host(
            s, h, DEPTH, INITIAL_KERNEL, SERIES_KERNELS, STRIDE,
            window_r_initial=176, window_r_series=[176] * (DEPTH + 1),
            window_r_down=320, window_r_rev=176,
        )
    )(st, host_j)

    assert (np.asarray(host["lvl0/n_active"]) == np.asarray(st.n_active)).all()
    assert (np.asarray(host["lvl0/coords"]) == np.asarray(st.coords)).all()

    ki = int(np.prod(INITIAL_KERNEL))
    w5 = jnp.asarray(r.integers(-2, 3, (ki, c, c)).astype(np.float32))
    a = jax.jit(
        lambda s, ww: submanifold_conv(
            s, build_submanifold_rulebook(s, INITIAL_KERNEL), ww
        ).feats
    )(st, w5)
    b = jax.jit(
        lambda s, p, ww: window_submanifold_conv(s, p, ww).feats
    )(st, plans.initial, w5)
    err = float(jnp.max(jnp.abs(a - b)))
    drop = int(jnp.sum(plans.initial.ov_dropped))
    print(f"initial {INITIAL_KERNEL}: max err {err:.1e}, dropped {drop}",
          flush=True)
    assert err == 0 and drop == 0

    lvl = st
    for l in range(DEPTH + 1):
        sk = SERIES_KERNELS[l]
        kk = int(np.prod(sk))
        cl = lvl.with_feats(
            jnp.asarray(
                np.random.default_rng(l).integers(
                    -3, 4, (*lvl.coords.shape[:2], c)
                ).astype(np.float32)
            )
            * lvl.row_mask()[..., None]
        )
        w3 = jnp.asarray(r.integers(-2, 3, (kk, c, c)).astype(np.float32))
        a = jax.jit(
            lambda s, ww, sk=sk: submanifold_conv(
                s, build_submanifold_rulebook(s, sk), ww
            ).feats
        )(cl, w3)
        b = jax.jit(
            lambda s, p, ww: window_submanifold_conv(s, p, ww).feats
        )(cl, plans.series[l], w3)
        err = float(jnp.max(jnp.abs(a - b)))
        drop = int(jnp.sum(plans.series[l].ov_dropped))
        print(f"lvl{l} series {sk}: max err {err:.1e}, dropped {drop}, "
              f"n={np.asarray(cl.n_active).tolist()}", flush=True)
        assert err == 0 and drop == 0

        if l < DEPTH:
            skel_dev = downsample_sites(cl, STRIDE, out_capacity=caps[l + 1])
            skel_host = plans.skeletons[l]
            assert (
                np.asarray(skel_dev.coords) == np.asarray(skel_host.coords)
            ).all(), f"lvl{l+1} skeleton mismatch"
            kd = int(np.prod(STRIDE))
            w8 = jnp.asarray(r.integers(-2, 3, (kd, c, c)).astype(np.float32))
            a = jax.jit(
                lambda s, skl, ww: strided_conv(
                    s, skl, build_downsample_rulebook(s, skl, STRIDE), ww
                ).feats
            )(cl, skel_host, w8)
            fwd, rev = plans.down[l]
            b = jax.jit(
                lambda s, skl, f, rv, ww: window_strided_conv(
                    s, skl, f, rv, ww
                ).feats
            )(cl, skel_host, fwd, rev, w8)
            err = float(jnp.max(jnp.abs(a - b)))
            print(f"lvl{l} downsample: max err {err:.1e}", flush=True)
            assert err == 0
            lvl = skel_host

    print("ALL 2D HOST-PLAN CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
