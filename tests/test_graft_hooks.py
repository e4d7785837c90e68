"""Driver entry points must keep working (compile check + multichip dryrun)."""

import jax
import numpy as np
import pytest

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "graft_entry", os.path.join(REPO, "__graft_entry__.py"))
graft = importlib.util.module_from_spec(spec)
spec.loader.exec_module(graft)


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (3, 256, 256)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_dryrun_multichip_eight():
    graft.dryrun_multichip(8)
