"""Per-event plan cache (io/plan_cache.py): cached assembly must be the
IDENTITY vs building the whole batch natively — the builder is per-event
and packs along the leading batch axis, so slice + re-concat is exact."""

import numpy as np
import pytest

from sparseeventid_tpu.io.hostio import HAVE_NATIVE, build_window_plans
from sparseeventid_tpu.io.plan_cache import PlanCache

pytestmark = pytest.mark.skipif(
    not HAVE_NATIVE, reason="native _hostio extension unavailable"
)

GRID, CAP, DEPTH = (32, 64, 64), 512, 2


def _coords(seed, b):
    rng = np.random.default_rng(seed)
    coords = np.full((b, CAP, 3), -1, np.int32)
    for i in range(b):
        c = np.stack(
            [
                rng.integers(0, GRID[0], 300),
                rng.integers(0, GRID[1], 300),
                rng.integers(0, GRID[2], 300),
            ],
            axis=-1,
        ).astype(np.int32)
        c = np.unique(c, axis=0)
        coords[i, : len(c)] = c
    return coords


def _build(c):
    return build_window_plans(
        c,
        GRID,
        [CAP, CAP // 2, CAP // 4],
        initial_kernel=(5, 5, 5),
        series_kernel=(3, 3, 3),
        stride=(2, 2, 2),
        window_r=176,
        ov_caps=[256] * (DEPTH + 1),
        ov_cap_initial=256,
        ov_caps_down=[256] * DEPTH,
        window_r_down=320,
    )


def test_cache_assembly_is_identity():
    coords = _coords(0, 6)
    direct = _build(coords)

    cache = PlanCache(_build, max_bytes=1 << 30)
    # warm with two overlapping sub-batches in a different order
    cache.plans_for("train", coords[[3, 1, 4]], [3, 1, 4])
    out = cache.plans_for("train", coords, list(range(6)))
    assert set(out) == set(direct)
    for k in direct:
        np.testing.assert_array_equal(out[k], direct[k], err_msg=k)
    assert cache.hits == 3 and cache.misses == 6
    # fully-warm second epoch: no new builds, still exact
    out2 = cache.plans_for("train", coords, list(range(6)))
    assert cache.misses == 6
    for k in direct:
        np.testing.assert_array_equal(out2[k], direct[k], err_msg=k)


def test_budget_exhausted_still_exact():
    coords = _coords(1, 4)
    direct = _build(coords)
    cache = PlanCache(_build, max_bytes=1)  # nothing fits
    out = cache.plans_for("train", coords, [0, 1, 2, 3])
    assert len(cache) == 0 and cache.nbytes == 0
    for k in direct:
        np.testing.assert_array_equal(out[k], direct[k], err_msg=k)


def test_split_keys_do_not_collide():
    a, b = _coords(2, 2), _coords(3, 2)
    cache = PlanCache(_build, max_bytes=1 << 30)
    out_a = cache.plans_for("train", a, [0, 1])
    out_b = cache.plans_for("val", b, [0, 1])  # same ids, different split
    direct_b = _build(b)
    for k in direct_b:
        np.testing.assert_array_equal(out_b[k], direct_b[k], err_msg=k)
    assert cache.misses == 4


def test_trainer_routes_loader_batches_through_cache():
    """The supervised train loader's transform must hit the cache on the
    second epoch (dataset indices flow through batch['index'])."""
    from sparseeventid_tpu.config import load_config
    from sparseeventid_tpu.train.trainer import Trainer

    cfg = load_config(
        "synthetic",
        [
            "run.id=plan_cache_t",
            "framework.sparse_backend=window",
            "run.minibatch_size=4",
            "data.synthetic_events=8",
            "encoder.depth=2",
            "mode.iterations=1",
            "output_dir=/tmp/plan_cache_t",
        ],
    )
    t = Trainer(cfg)
    try:
        loader = t._loader("train")
        seen = set()
        for _ in range(4):  # two epochs of 8 events at batch 4
            batch = next(loader)
            assert "host_plans" in batch and "index" in batch
            seen.update(int(i) for i in batch["index"])
        assert seen == set(range(8))
        assert t._plan_cache is not None
        assert t._plan_cache.hits >= 8  # epoch 2 fully cached
    finally:
        t._shutdown()
