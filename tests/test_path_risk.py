"""Simulated max-drawdown risk: lax reference vs Pallas kernel (interpret), sanity laws."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcport.config import GBMConfig, SketchConfig
from mcport.engine.path_risk import DD_SKETCH, run_path_risk
from mcport.models.gbm import GBMParams

A = 3
PARAMS = GBMParams(
    s0=np.array([100.0, 50.0, 20.0]),
    mean_step=np.array([0.002, 0.001, 0.0015]),
    chol_step=np.linalg.cholesky(0.0009 * (0.6 * np.eye(A) + 0.4)),
)
W = np.array([0.5, 0.3, 0.2])


def cfg(**kw):
    base = dict(n_paths=8192, n_steps=16, path_block=2048, seed=3, use_pallas=False)
    base.update(kw)
    return GBMConfig(**base)


def test_report_sanity():
    r = run_path_risk(PARAMS, W, cfg())
    assert -1.0 <= r.dd_p95 <= r.dd_median <= 0.0
    assert -1.0 <= r.dd_mean <= 0.0
    assert r.cvar <= r.var
    assert r.n_paths == 8192
    # drawdown p95 is at least as bad as the terminal VaR when VaR is negative
    # (the running minimum can only be <= the terminal dip)
    if r.var < 0:
        assert r.dd_p95 <= r.var + 1e-6


def test_longer_horizon_worsens_drawdown():
    r_short = run_path_risk(PARAMS, W, cfg(n_steps=4))
    r_long = run_path_risk(PARAMS, W, cfg(n_steps=64))
    assert r_long.dd_p95 < r_short.dd_p95
    assert r_long.dd_mean < r_short.dd_mean


def test_zero_vol_drawdown_exact():
    p = GBMParams(
        s0=np.ones(A) * 10,
        mean_step=np.full(A, -0.01),
        chol_step=np.zeros((A, A)),
    )
    r = run_path_risk(p, np.full(A, 1 / A), cfg(n_steps=5))
    want = np.exp(-0.01 * 5) - 1.0
    bin_w = 1.0 / DD_SKETCH.n_bins
    assert r.dd_mean == pytest.approx(want, abs=1e-6)
    assert r.dd_median == pytest.approx(want, abs=2 * bin_w)


def test_deterministic():
    a = run_path_risk(PARAMS, W, cfg())
    b = run_path_risk(PARAMS, W, cfg())
    assert a == b
