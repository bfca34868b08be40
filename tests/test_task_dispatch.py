"""All four tasks are reachable from the CLI config (reference
bin/exec.py:280-301 dispatch): supervised_eventID / simclr / yolo /
unsupervised_eventID train end-to-end on synthetic data via run_mode."""

import numpy as np
import pytest

from sparseeventid_tpu.config import load_config
from sparseeventid_tpu.train.trainer import Trainer, run_mode

TINY = [
    "encoder.depth=2",
    "encoder.blocks_per_layer=1",
    "encoder.n_initial_filters=8",
    "encoder.n_output_filters=16",
    "framework.min_capacity=64",
    "run.minibatch_size=2",
    "mode.iterations=3",
    "mode.checkpoint_iteration=100",
    "data.max_voxels=256",
    "data.synthetic_events=8",
]


def _cfg(tmp_path, name, extra=()):
    return load_config(
        "synthetic",
        TINY + [f"name={name}", f"output_dir={tmp_path}", *extra],
    )


@pytest.mark.parametrize(
    "task,extra",
    [
        ("supervised_eventID", ()),
        ("simclr", ("data.transform1=true", "data.transform2=true")),
        ("yolo", ()),
        ("unsupervised_eventID", ()),
    ],
)
def test_task_trains_via_cli_dispatch(tmp_path, task, extra):
    cfg = _cfg(tmp_path, task, extra)
    state = run_mode(cfg)
    assert int(state.step) == 3


def test_yolo_inference_writes_val_outputs(tmp_path):
    """Vertex inference drops per-event arrays under
    output_dir/validation_output (vertex_finding.py:154-178 parity)."""
    cfg = _cfg(tmp_path, "yolo", ("mode=inference",))
    trainer = Trainer(cfg)
    trainer.validate()
    files = list(tmp_path.glob("**/validation_output/val_rank_0.npz"))
    assert len(files) == 1
    out = np.load(files[0])
    n = len(trainer.datasets["val" if "val" in trainer.datasets else "test"])
    n = (n // cfg.run.minibatch_size) * cfg.run.minibatch_size or n
    assert set(out.files) >= {
        "label", "vertex_true", "anchor", "vertex", "pred_label"
    }
    assert out["vertex"].shape == (n, 3)
    assert out["vertex_true"].shape == (n, 3)
    assert np.isfinite(out["vertex"]).all()


def test_unknown_task_rejected(tmp_path):
    cfg = _cfg(tmp_path, "not_a_task")
    with pytest.raises(ValueError, match="unknown task name"):
        run_mode(cfg)


def test_simclr_views_differ(tmp_path):
    """The two SimCLR views must be different augmentations, not copies."""
    cfg = _cfg(tmp_path, "simclr", ("data.transform1=true", "data.transform2=true"))
    trainer = Trainer(cfg)
    try:
        out = trainer._build_training()
        prepare = out[4]
        batch = trainer.datasets["train"].batch([0, 1])
        v1, v2 = prepare(batch)[:2]
        assert not np.array_equal(np.asarray(v1.coords), np.asarray(v2.coords))
    finally:
        trainer._shutdown()


def test_vertex_targets_present_in_datasets(tmp_path):
    from sparseeventid_tpu.io import SyntheticDataset, SyntheticEventConfig
    from sparseeventid_tpu.io.larcv import LarcvDataset, write_synthetic_larcv_file

    ds = SyntheticDataset(4, SyntheticEventConfig(image_size=(16, 16, 16)), seed=0)
    b = ds.batch([0, 1])
    assert b["vertex"].shape == (2, 3)
    assert (b["vertex"] >= 0).all() and (b["vertex"] < 16).all()
    assert b["energy"].shape == (2,)

    path = write_synthetic_larcv_file(
        tmp_path / "v.h5", 3, image_size=(16, 16, 16), seed=1
    )
    lds = LarcvDataset(path, "dunevoxels", max_voxels=256)
    lb = lds.batch([0, 2])
    assert lb["vertex"].shape == (2, 3)
    assert np.isfinite(lb["vertex"]).all()
    assert lb["energy"].shape == (2,)


def test_visualize_mode_writes_event_displays(tmp_path):
    """mode=visualize renders per-event projection PNGs (the reference CLI
    advertises this mode but dispatches to a nonexistent method —
    /root/reference/bin/exec.py:79-80; here it works)."""
    cfg = load_config(
        "synthetic",
        [
            "mode=visualize", "mode.events=2", "run.minibatch_size=2",
            "data.max_voxels=256", "data.synthetic_events=8",
            f"output_dir={tmp_path}",
        ],
    )
    written = run_mode(cfg)
    assert len(written) == 2
    for p in written:
        assert p.exists() and p.stat().st_size > 1000


def test_visualize_mode_2d_multiplane(tmp_path):
    cfg = load_config(
        "synthetic",
        [
            "mode=visualize", "mode.events=1", "run.minibatch_size=1",
            "data.dimension=2", "data.max_voxels=256",
            "data.synthetic_events=4", f"output_dir={tmp_path}",
        ],
    )
    written = run_mode(cfg)
    assert len(written) == 1 and written[0].exists()
