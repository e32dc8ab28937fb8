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
    """entry() must hand back the production fused-chunk program family:
    jit-compiling it on one device and running the example wire buffers
    yields the s16 dpack output wire (a non-empty u8 buffer whose header
    word is a plausible payload byte count)."""
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    host = np.asarray(out)
    assert host.dtype == np.uint8
    assert host.size > 0
    nbytes = int(host[:4].view(np.uint32)[0]) if host.ndim == 1 else int(
        host.reshape(-1)[:4].view(np.uint32)[0]
    )
    assert 0 < nbytes <= host.size


@pytest.mark.parametrize("n", [8, 4])
def test_dryrun_multichip(n):
    if len(jax.devices()) < n:
        pytest.skip("not enough virtual devices")
    graft.dryrun_multichip(n)
