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
    graft.dryrun_multichip(8)


def test_dryrun_multichip_1():
    graft.dryrun_multichip(1)


def test_dryrun_too_many_devices():
    with pytest.raises(RuntimeError, match="devices"):
        graft.dryrun_multichip(10_000)
