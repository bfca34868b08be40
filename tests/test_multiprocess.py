"""True multi-process distributed test (VERDICT r2 item #7).

Two jax.distributed CPU processes (4 virtual devices each) run one DP
train step over the global 8-device mesh, each reading its own event
shard through the real BatchLoader.  The resulting loss and updated-param
norm must (a) agree across ranks and (b) match a single-process 8-device
run on the same global batch — replacing the reference's
distributed_queue_interface / DDP validation that only ever ran on real
clusters (/root/reference/src/utils/torch/distributed_trainer.py:42-78).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _scrubbed_env(local_devices: int) -> dict:
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON_", "AXON_", "TPU_", "LIBTPU_"))
        and k not in ("_AXON_REGISTERED", "PJRT_LIBRARY_PATH", "SEID_DRYRUN_CHILD")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["SEID_FORCE_CPU"] = "1"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    return env


def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"rank{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(REPO / "tests" / "multiproc_worker.py"),
                str(i),
                "2",
                str(port),
                str(outs[i]),
            ],
            env=_scrubbed_env(4),
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"rank {i} failed:\n{logs[i][-3000:]}"
    results = [json.loads(o.read_text()) for o in outs]

    # (a) ranks agree bit-for-bit on the replicated outputs
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["gnorm"] == results[1]["gnorm"]

    # (b) matches a single-process 8-device run on the same global batch.
    # The global batch is the concatenation of the two per-host shards the
    # workers read (BatchLoader process_index split); reproduce it here
    # with the same loader parameters and run the same step on the
    # in-process 8-device CPU mesh (conftest provides it).
    sys.path.insert(0, str(REPO / "tests"))
    import multiproc_worker as w

    import jax

    local0 = w.build_local_batch(0, 2)
    local1 = w.build_local_batch(1, 2)
    glob = {
        k: np.concatenate([local0[k], local1[k]], axis=0) for k in local0
    }
    devices = jax.devices("cpu")[:8]
    loss, gnorm = w.global_step_outputs(glob, devices, 8)
    assert np.isclose(loss, results[0]["loss"], rtol=1e-5, atol=1e-6), (
        loss,
        results[0]["loss"],
    )
    assert np.isclose(gnorm, results[0]["gnorm"], rtol=1e-5, atol=1e-6), (
        gnorm,
        results[0]["gnorm"],
    )


def test_initialize_distributed_env_configured_failure_raises():
    """An env-configured multi-host bootstrap that fails must raise, not
    silently degrade to single-process (initialize_distributed contract)."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, '.');"
        "from sparseeventid_tpu.parallel import initialize_distributed;"
        "initialize_distributed(num_processes=2, process_id=0)"
    )
    env = _scrubbed_env(1)
    env["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:1"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode != 0, proc.stdout + proc.stderr
