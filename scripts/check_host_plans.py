#!/usr/bin/env python
"""On-TPU equality check: host-built plans (C++ build_window_plans) drive the
window engine to the same integer-exact results as the XLA rulebook backend,
through the FULL encoder (initial 5^3 conv, block series, downsamples).

Integer-valued features/weights make bf16 MXU passes exact (see
check_window_tpu.py), so any nonzero difference is a plan bug."""

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

GRID = (1024, 512, 1280)
BATCH = 4
CAP = 25000
ACTIVE = 20000
DEPTH = 3


def make_st(seed, c):
    r = np.random.default_rng(seed)
    coords = np.full((BATCH, CAP, 3), -1, np.int32)
    for b in range(BATCH):
        per = ACTIVE // 40
        pts = []
        for t in range(40):
            start = r.uniform(0.2, 0.8, 3) * np.array(GRID)
            d = r.normal(size=3)
            d /= np.linalg.norm(d)
            steps = np.arange(per)[:, None] * d[None, :] * 2.0
            pts.append(start[None, :] + steps + r.normal(scale=0.6, size=(per, 3)))
        pts = np.concatenate(pts)
        np.clip(pts, 0, np.array(GRID) - 1, out=pts)
        cc = np.unique(pts.astype(np.int32), axis=0)
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

    import time

    t0 = time.perf_counter()
    host = build_window_plans(
        raw_coords, GRID, caps,
        initial_kernel=(5, 5, 5), series_kernel=(3, 3, 3), stride=(2, 2, 2),
        window_r=176, window_r_initial=176,
        ov_caps=[engine._overflow_cap(cc, 27) for cc in caps],
        ov_cap_initial=engine._overflow_cap(caps[0], 125),
        ov_caps_down=[engine._overflow_cap(cc, 8) for cc in caps[:-1]],
        window_r_down=320,
    )
    t_host = time.perf_counter() - t0
    print(f"host plan build: {t_host*1000:.1f} ms for B={BATCH} depth={DEPTH}")
    host_j = {k: jnp.asarray(v) for k, v in host.items()}

    plans = jax.jit(
        lambda s, h: encoder_plans_from_host(
            s, h, DEPTH, (5, 5, 5), (3, 3, 3), (2, 2, 2),
            window_r_initial=176, window_r_series=[176] * (DEPTH + 1),
            window_r_down=320, window_r_rev=176,
        )
    )(st, host_j)

    # sanity: host level-0 sort order matches device build_sparse_tensor
    dev_keys = np.asarray(st.keys())
    host_l0 = np.asarray(host["lvl0/coords"])
    assert (np.asarray(host["lvl0/n_active"]) == np.asarray(st.n_active)).all()
    assert (host_l0 == np.asarray(st.coords)).all(), "level-0 order mismatch"

    total_drop = 0
    # --- initial 5^3 conv on level 0 ---
    w5 = jnp.asarray(r.integers(-2, 3, (125, c, c)).astype(np.float32))
    a = jax.jit(
        lambda s, ww: submanifold_conv(
            s, build_submanifold_rulebook(s, (5, 5, 5)), ww
        ).feats
    )(st, w5)
    b = jax.jit(
        lambda s, p, ww: window_submanifold_conv(s, p, ww).feats
    )(st, plans.initial, w5)
    err = float(jnp.max(jnp.abs(a - b)))
    drop = int(jnp.sum(plans.initial.ov_dropped))
    print(f"initial 5^3: max err {err:.1e}, dropped {drop}")
    assert err == 0 and drop == 0

    # --- per-level series conv + downsample ---
    lvl = st
    for l in range(DEPTH + 1):
        cl = lvl.with_feats(
            jnp.asarray(
                np.random.default_rng(l).integers(
                    -3, 4, (*lvl.coords.shape[:2], c)
                ).astype(np.float32)
            )
            * lvl.row_mask()[..., None]
        )
        w3 = jnp.asarray(r.integers(-2, 3, (27, c, c)).astype(np.float32))
        a = jax.jit(
            lambda s, ww: submanifold_conv(
                s, build_submanifold_rulebook(s, (3, 3, 3)), ww
            ).feats
        )(cl, w3)
        b = jax.jit(
            lambda s, p, ww: window_submanifold_conv(s, p, ww).feats
        )(cl, plans.series[l], w3)
        err = float(jnp.max(jnp.abs(a - b)))
        drop = int(jnp.sum(plans.series[l].ov_dropped))
        print(f"lvl{l} series: max err {err:.1e}, dropped {drop}, "
              f"n={np.asarray(lvl.n_active).tolist()}")
        assert err == 0 and drop == 0

        if l < DEPTH:
            skel_dev = downsample_sites(cl, (2, 2, 2), out_capacity=caps[l + 1])
            skel_host = plans.skeletons[l]
            assert (
                np.asarray(skel_dev.coords) == np.asarray(skel_host.coords)
            ).all(), f"lvl{l+1} skeleton mismatch"
            w8 = jnp.asarray(r.integers(-2, 3, (8, c, c)).astype(np.float32))
            a = jax.jit(
                lambda s, sk, ww: strided_conv(
                    s, sk, build_downsample_rulebook(s, sk, (2, 2, 2)), ww
                ).feats
            )(cl, skel_host, w8)
            fwd, rev = plans.down[l]
            b = jax.jit(
                lambda s, sk, f, rv, ww: window_strided_conv(
                    s, sk, f, rv, ww
                ).feats
            )(cl, skel_host, fwd, rev, w8)
            err = float(jnp.max(jnp.abs(a - b)))
            print(f"lvl{l} downsample: max err {err:.1e}")
            assert err == 0

            # strided gradient equality through the host rev plan
            ct = jnp.asarray(
                r.integers(-2, 3, (BATCH, caps[l + 1], c)).astype(np.float32)
            )

            def loss_w(ww, f, s=cl, sk=skel_host, fp=fwd, rp=rev, ct=ct):
                o = window_strided_conv(s.with_feats(f), sk, fp, rp, ww)
                return jnp.sum(o.feats.astype(jnp.float32) * ct)

            def loss_x(ww, f, s=cl, sk=skel_host, ct=ct):
                rb = build_downsample_rulebook(s, sk, (2, 2, 2))
                o = strided_conv(s.with_feats(f), sk, rb, ww)
                return jnp.sum(o.feats.astype(jnp.float32) * ct)

            gw, gf = jax.jit(jax.grad(loss_w, argnums=(0, 1)))(w8, cl.feats)
            gwx, gfx = jax.jit(jax.grad(loss_x, argnums=(0, 1)))(w8, cl.feats)
            ew = float(jnp.max(jnp.abs(gw - gwx)))
            ef = float(jnp.max(jnp.abs(gf - gfx)))
            print(f"lvl{l} downsample grads: dW err {ew:.1e}, dX err {ef:.1e}")
            assert ew == 0 and ef == 0
            lvl = skel_host

    print("HOST PLAN CHECKS PASSED")


if __name__ == "__main__":
    main()
