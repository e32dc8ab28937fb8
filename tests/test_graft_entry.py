"""Driver contract: entry() compiles single-chip; dryrun_multichip runs on
the virtual CPU mesh."""

import pathlib
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    F, C, half = args[0].shape
    assert out.shape == (F - 1, C, half)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("n", [8, 4])
def test_dryrun_multichip(n):
    if len(jax.devices()) < n:
        pytest.skip("not enough virtual devices")
    graft.dryrun_multichip(n)
