"""Driver-contract insurance: entry() compiles and dryrun_multichip works
on the virtual 8-device CPU mesh (conftest forces it)."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_entry_forward():
    import __graft_entry__ as g

    fn, (variables, st) = g.entry()
    out = jax.jit(fn)(variables, st)
    assert set(out.keys()) == {
        "labelneutID", "labelprotID", "labelnpiID", "labelcpiID"
    }
    assert all(bool(np.isfinite(np.asarray(v)).all()) for v in out.values())


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_main_survives_poisoned_default_backend():
    """Regression for MULTICHIP_r01/r02: the driver gate failed because the
    default backend (remote TPU with a libtpu mismatch) was touched before
    the dryrun ran.  Simulate a poisoned default backend — JAX_PLATFORMS
    names a backend that is not registered (PALLAS_AXON_POOL_IPS scrubbed,
    so the sitecustomize hook never registers "axon") — and require the
    bare ``python __graft_entry__.py`` invocation to still exit 0."""
    import os
    import subprocess

    repo = Path(__file__).resolve().parents[1]
    env = {
        k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"
    }
    env["JAX_PLATFORMS"] = "axon"  # unregistered -> any backend touch raises
    env.pop("SEID_DRYRUN_CHILD", None)
    env.pop("SEID_FORCE_CPU", None)
    proc = subprocess.run(
        [sys.executable, str(repo / "__graft_entry__.py")],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout
