"""Driver contract: entry() compiles and runs; dryrun_multichip exercises the mesh."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    var, cvar, mean, term_mean = out
    assert float(cvar) <= float(var)
    assert term_mean.shape == (4,)


def test_dryrun_multichip_8(eight_devices):
    # suite diet: the 1-device dryrun was dropped — the driver compile-checks
    # entry() single-chip, and dryrun(1) runs the identical engine list this
    # 8-device case covers, just on a degenerate mesh (~250 s of suite wall).
    graft.dryrun_multichip(8)


def test_dryrun_too_many_devices():
    with pytest.raises(RuntimeError, match="devices"):
        graft.dryrun_multichip(10_000)
