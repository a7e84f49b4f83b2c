"""Merton common-jump model: calibration recovery, exact terminal law, risk."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.models.gbm import GBMParams
from mcport.models.jump import (
    MertonParams,
    estimate_merton_common,
    merton_risk,
    merton_terminal_returns,
)

A = 3


def _params(jump_rate=0.05):
    diff = GBMParams(
        s0=np.ones(A),
        mean_step=np.array([0.001, 0.002, 0.0015]),
        chol_step=np.linalg.cholesky(4e-4 * (0.5 * np.eye(A) + 0.5)),
    )
    return MertonParams(
        diffusion=diff,
        jump_rate=jump_rate,
        jump_mean=np.array([-0.10, -0.15, -0.08]),
        jump_vol=np.array([0.05, 0.08, 0.04]),
    )


def test_zero_rate_reduces_to_gbm_law():
    p = _params(jump_rate=0.0)
    term = np.asarray(merton_terminal_returns(
        jax.random.key(0), p.diffusion.mean_step, p.diffusion.chol_step,
        0.0, p.jump_mean, p.jump_vol, 100_000, 12, dtype=jnp.float64))
    cov_true = 12 * (p.diffusion.chol_step @ p.diffusion.chol_step.T)
    np.testing.assert_allclose(term.mean(0), 12 * p.diffusion.mean_step,
                               atol=6 * np.sqrt(cov_true.max() / 1e5))
    np.testing.assert_allclose(np.cov(term, rowvar=False), cov_true, rtol=0.05)


def test_terminal_moments_match_compound_poisson():
    """E[term] = n m + lam n muJ; Var_a = n Sigma_aa + lam n (muJ_a^2 + sigJ_a^2)."""
    p = _params(jump_rate=0.08)
    n_steps, n_paths = 10, 400_000
    term = np.asarray(merton_terminal_returns(
        jax.random.key(1), p.diffusion.mean_step, p.diffusion.chol_step,
        p.jump_rate, p.jump_mean, p.jump_vol, n_paths, n_steps,
        dtype=jnp.float64))
    lam_n = p.jump_rate * n_steps
    want_mean = n_steps * p.diffusion.mean_step + lam_n * p.jump_mean
    sigma = p.diffusion.chol_step @ p.diffusion.chol_step.T
    want_var = n_steps * np.diag(sigma) + lam_n * (p.jump_mean**2 + p.jump_vol**2)
    got_mean = term.mean(0)
    got_var = term.var(0, ddof=1)
    se_mean = np.sqrt(want_var / n_paths)
    assert np.all(np.abs(got_mean - want_mean) < 6 * se_mean)
    np.testing.assert_allclose(got_var, want_var, rtol=0.05)


def test_calibration_recovers_rate_and_sizes():
    """Synthetic series with planted systemic jumps: the threshold calibrator
    must recover the rate and (negative) jump means."""
    rng = np.random.default_rng(77)  # local: immune to suite draw order
    t_len = 4000
    m = np.array([0.001, 0.0015, 0.0008])
    chol = np.linalg.cholesky(4e-4 * (0.4 * np.eye(A) + 0.6))
    z = rng.normal(0, 1, (t_len, A)) @ chol.T
    logret = m + z
    jump_rate = 0.03
    jumps = rng.random(t_len) < jump_rate
    sizes = np.array([-0.12, -0.18, -0.10]) + rng.normal(0, 0.02, (t_len, A))
    logret[jumps] += sizes[jumps]
    prices = np.exp(np.cumsum(np.vstack([np.zeros(A), logret]), axis=0)) * 100

    p = estimate_merton_common(prices, threshold=3.0)
    n_expected = jumps.sum()
    assert 0.5 * jump_rate < p.jump_rate < 1.5 * jump_rate, p.jump_rate
    assert np.all(p.jump_mean < -0.05)          # strongly negative, as planted
    # diffusion vol not inflated by jumps: the threshold fit carries a
    # seed-dependent censoring/contamination bias of up to ~1/3 (borderline
    # jumps leak into the calm set), but must be FAR closer to truth than the
    # naive all-steps fit, which is ~2x too high with these jump sizes.
    truth = np.diag(chol @ chol.T)
    got = np.diag(p.diffusion.chol_step @ p.diffusion.chol_step.T)
    np.testing.assert_allclose(got, truth, rtol=0.35)
    naive = np.diff(np.log(prices), axis=0).var(axis=0, ddof=1)
    assert np.all(np.abs(got - truth) < 0.5 * np.abs(naive - truth))


def test_no_jumps_degrades_to_gbm():
    rng = np.random.default_rng(78)
    logret = 0.001 + rng.normal(0, 0.01, (500, A))
    prices = np.exp(np.cumsum(np.vstack([np.zeros(A), logret]), axis=0))
    p = estimate_merton_common(prices, threshold=6.0)  # nothing clears 6 sigma
    assert p.jump_rate == 0.0
    assert np.all(p.jump_mean == 0.0)


def test_merton_risk_fatter_than_diffusion_only():
    p = _params(jump_rate=0.06)
    w = np.full(A, 1.0 / A)
    risky = merton_risk(jax.random.key(2), p, w, n_paths=131_072, n_steps=26)
    calm = merton_risk(jax.random.key(2), _params(jump_rate=0.0), w,
                       n_paths=131_072, n_steps=26)
    assert float(risky.cvar) < float(calm.cvar)
    assert float(risky.var) < float(calm.var)   # negative-mean jumps move VaR too
    assert 0.5 < float(risky.jump_frac) <= 1.0  # lam*n = 1.56 → P[N>0] ~ 0.79
    assert float(calm.jump_frac) == 0.0
    # covering sketch: no clamped mass
    counts = np.asarray(risky.hist)
    assert counts[0] == 0 and counts[-1] == 0


def test_degenerate_threshold_clear_error():
    rng = np.random.default_rng(79)
    logret = 0.001 + rng.normal(0, 0.01, (200, A))
    prices = np.exp(np.cumsum(np.vstack([np.zeros(A), logret]), axis=0))
    with pytest.raises(ValueError, match="calm steps"):
        estimate_merton_common(prices, threshold=0.01)
