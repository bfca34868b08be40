"""Kernel-tuning single-source-of-truth tests (VERDICT r2 weak #5).

The window sizes the host plan builder uses and the ones the conv kernels
slice with must come from the same resolved WindowTuning; config-tree
values flow through configure_tuning, SEID_* env vars stay as overrides.
"""

import dataclasses
import os

import pytest

from sparseeventid_tpu.config import load_config
from sparseeventid_tpu.ops.pallas import window_conv as wc


@pytest.fixture(autouse=True)
def _restore_tuning():
    before = dataclasses.replace(wc.TUNING)
    yield
    wc.TUNING = before


def test_config_values_flow():
    wc.configure_tuning(window_r=128, window_r_deep=176, window_r_deep_from=2,
                        window_r_initial=96, window_r_strided=352)
    assert wc.window_r_default() == 128
    assert wc.window_r_initial() == 96
    assert wc.window_r_strided() == 352
    assert wc.window_r_for_level(0) == 128
    assert wc.window_r_for_level(2) == 176


def test_env_overrides_config(monkeypatch):
    monkeypatch.setenv("SEID_WINDOW_R", "160")
    wc.configure_tuning(window_r=128)
    assert wc.window_r_default() == 160  # env wins over config


def test_unknown_knob_rejected():
    with pytest.raises(KeyError, match="unknown window tuning knob"):
        wc.configure_tuning(window_q=7)


def test_trainer_geometry_uses_configured_tuning(tmp_path):
    """The trainer's host-plan geometry dict must carry the config-tree
    window sizes (what the C++ builder receives), and the encoder plans
    built on device must stamp the same values — one source of truth."""
    from sparseeventid_tpu.train.trainer import Trainer

    cfg = load_config(
        "synthetic",
        [
            "encoder.depth=2",
            "encoder.blocks_per_layer=1",
            "encoder.n_initial_filters=8",
            "framework.min_capacity=64",
            "run.minibatch_size=2",
            "data.synthetic_events=4",
            "framework.tuning.window_r=112",
            "framework.tuning.window_r_deep=176",
            "framework.tuning.window_r_deep_from=1",
            "framework.tuning.window_r_initial=96",
            "framework.tuning.window_r_strided=304",
            f"output_dir={tmp_path}",
        ],
    )
    t = Trainer(cfg)
    geo = t._plan_geometry()
    assert geo["window_r"] == 112
    assert geo["window_r_initial"] == 96
    assert geo["window_r_down"] == 304
    assert geo["window_r_series"] == [112, 176, 176]


def test_default_resolution_unchanged():
    """Defaults must match the shipped values: sized for FULL dune3d
    occupancy (26-42k active voxels), where the round-2 144/144 schedule
    overflowed the initial 5^3 plan's sidecar cap (r3 e2e attribution)."""
    wc.configure_tuning()
    assert wc.window_r_default() == 160
    assert wc.window_r_strided() == 320
    assert wc.window_r_initial() == 176
    assert wc.window_r_for_level(0) == 160
    assert wc.window_r_for_level(3) == 160
    assert wc.TUNING.p_series == 4
