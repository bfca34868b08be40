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
