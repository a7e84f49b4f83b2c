"""Scenario stress testing (engine.stress)."""

import numpy as np
import pytest

from mcport.engine.stress import (
    StressReport,
    corr_to_one,
    scale_vol,
    shift_mean,
    stress_params,
    stress_test,
)
from mcport.models.gbm import GBMParams

A = 4


def _params(rho=0.3, vol=0.02):
    corr = (1 - rho) * np.eye(A) + rho
    chol = np.linalg.cholesky(vol**2 * corr)
    return GBMParams(s0=np.ones(A) * 100,
                     mean_step=np.full(A, 5e-4), chol_step=chol)


def test_transforms_are_exact():
    p = _params()
    cov = np.asarray(p.chol_step) @ np.asarray(p.chol_step).T
    p2 = scale_vol(p, 2.0)
    cov2 = np.asarray(p2.chol_step) @ np.asarray(p2.chol_step).T
    np.testing.assert_allclose(cov2, 4.0 * cov, rtol=1e-12)

    pc = corr_to_one(p, 1.0)
    covc = np.asarray(pc.chol_step) @ np.asarray(pc.chol_step).T
    sd = np.sqrt(np.diag(cov))
    np.testing.assert_allclose(covc, np.outer(sd, sd), rtol=1e-6, atol=1e-9)
    # vols preserved (to the 1e-9 PSD jitter)
    np.testing.assert_allclose(np.diag(covc), np.diag(cov), rtol=0, atol=2e-9)

    pm = shift_mean(p, 1.0)
    np.testing.assert_allclose(np.asarray(p.mean_step) - np.asarray(pm.mean_step),
                               sd, rtol=1e-12)


def test_stress_directions_and_deltas():
    """Shocks must move tail risk the right way: more vol, more correlation,
    or a crash overlay all worsen VaR/CVaR; deltas are metrics minus base."""
    p = _params()
    w = np.full(A, 0.25)
    rep = stress_test(p, w, n_paths=65_536, n_steps=13, seed=1)
    assert rep.base["cvar"] <= rep.base["var"] < 0.0
    for name in ("vol_x1.5", "vol_x2", "corr_to_one", "mean_-1sig", "crash_jump"):
        m = rep.scenarios[name]
        assert m["var"] < rep.base["var"], name
        assert m["cvar"] < rep.base["cvar"], name
        np.testing.assert_allclose(m["d_var"], m["var"] - rep.base["var"],
                                   rtol=0, atol=1e-12)
    # vol_x2 strictly worse than vol_x1.5; zero-ish drift => VaR ~ scales
    assert rep.scenarios["vol_x2"]["var"] < rep.scenarios["vol_x1.5"]["var"]
    ratio = rep.scenarios["vol_x2"]["var"] / rep.base["var"]
    assert 1.6 < ratio < 2.6
    name, worst = rep.worst("cvar")
    assert worst["cvar"] == min(s["cvar"] for s in rep.scenarios.values())


def test_custom_scenarios_and_guards():
    p = _params()
    w = np.full(A, 0.25)
    rep = stress_test(p, w, scenarios={"calm": lambda q: scale_vol(q, 0.5)},
                      n_paths=16_384, n_steps=8)
    assert set(rep.scenarios) == {"calm"}
    assert rep.scenarios["calm"]["var"] > rep.base["var"]   # less vol, less risk
    with pytest.raises(ValueError):
        stress_params(p, "nope")
    p2 = stress_params(p, "vol_x2")
    np.testing.assert_allclose(np.asarray(p2.chol_step),
                               2 * np.asarray(p.chol_step), rtol=1e-12)


def test_explicit_crash_survives_custom_scenarios():
    """A non-default crash_jump is an explicit request: it must appear even
    when a custom scenario set replaces the built-ins."""
    p = _params()
    w = np.full(A, 0.25)
    rep = stress_test(p, w, scenarios={"calm": lambda q: scale_vol(q, 0.5)},
                      n_paths=16_384, n_steps=8, crash_jump=(0.1, -0.2))
    assert set(rep.scenarios) == {"calm", "crash_jump"}
    assert rep.scenarios["crash_jump"]["cvar"] < rep.base["cvar"]
    # default crash value with custom scenarios stays opt-in (unchanged)
    rep2 = stress_test(p, w, scenarios={"calm": lambda q: scale_vol(q, 0.5)},
                       n_paths=16_384, n_steps=8)
    assert set(rep2.scenarios) == {"calm"}


# ---- path-tier stress (late round 3) ---------------------------------------


def test_path_stress_vol_shock_deepens_drawdowns():
    from mcport.engine.stress import path_stress_test

    p = _params()
    w = np.full(A, 1.0 / A)
    rep = path_stress_test(p, w, n_paths=8_192, n_steps=16,
                           path_block=4_096, seed=3)
    assert set(rep.base) >= {"var", "cvar", "dd_p95", "dd_median"}
    for name in ("vol_x1.5", "vol_x2", "corr_to_one", "mean_-1sig",
                 "crash_jump"):
        assert name in rep.scenarios
    # doubling vol must deepen the drawdown tail, monotonically past x1.5
    assert rep.scenarios["vol_x2"]["d_dd_p95"] < 0
    assert (rep.scenarios["vol_x2"]["dd_p95"]
            < rep.scenarios["vol_x1.5"]["dd_p95"])
    # crash overlay worsens the dd tail vs base
    assert rep.scenarios["crash_jump"]["d_dd_p95"] < 0
    # deterministic
    rep2 = path_stress_test(p, w, n_paths=8_192, n_steps=16,
                            path_block=4_096, seed=3)
    assert rep2.scenarios["vol_x2"]["dd_p95"] == rep.scenarios["vol_x2"]["dd_p95"]
    name, worst = rep.worst("dd_p95")
    assert worst["dd_p95"] == min(s["dd_p95"] for s in rep.scenarios.values())
