"""Euler CVaR attribution (engine.attribution)."""

import jax
import numpy as np

from mcport.engine.attribution import cvar_attribution, simulated_cvar_attribution
from mcport.engine.cvar_opt import exact_tail_metrics
from mcport.models.gbm import GBMParams

A = 4


def _terminal(n=50_000, seed=0):
    rng = np.random.default_rng(seed)
    vol = np.linspace(0.05, 0.30, A)
    common = rng.standard_normal((n, 1))
    return (0.01 + vol * (0.5 * common + 0.9 * rng.standard_normal((n, A)))
            ).astype(np.float32)


def test_euler_identity_and_tail_convention():
    """Components sum to the portfolio CVaR exactly, and var/cvar match
    exact_tail_metrics' top-k convention on the same scenarios."""
    term = _terminal()
    w = np.array([0.4, 0.3, 0.2, 0.1])
    att = cvar_attribution(term, w, alpha=0.95)
    np.testing.assert_allclose(att.contributions.sum(), att.cvar, rtol=1e-10)
    np.testing.assert_allclose(att.shares.sum(), 1.0, rtol=1e-10)
    v, c = exact_tail_metrics(term, w.astype(np.float32), 0.95)
    np.testing.assert_allclose(att.var, float(v), atol=2e-6)
    np.testing.assert_allclose(att.cvar, float(c), atol=2e-6)
    # k via THE repo formula: ceil((1 - alpha) * n); note (1.0 - 0.95) is
    # 0.050000000000000044 in binary, so k = 2501 here — not ceil(0.05 * n)
    import math
    assert att.n_tail == math.ceil((1 - 0.95) * term.shape[0])


def test_riskier_asset_owns_more_tail():
    """With equal weights, the highest-vol asset must contribute the most
    tail loss (largest negative component)."""
    term = _terminal(seed=1)
    att = cvar_attribution(term, np.full(A, 0.25), alpha=0.95)
    assert np.argmin(att.contributions) == A - 1     # vol ramps up with index
    assert att.contributions[A - 1] < att.contributions[0] < 0.0
    assert att.shares[A - 1] > att.shares[0] > 0.0


def test_zero_weight_zero_contribution():
    term = _terminal(seed=2)
    w = np.array([0.5, 0.5, 0.0, 0.0])
    att = cvar_attribution(term, w, alpha=0.9)
    np.testing.assert_allclose(att.contributions[2:], 0.0, atol=1e-12)


def test_threshold_ties_weighted_fractionally():
    """Duplicated portfolio values at the threshold must not inflate the tail
    mean: cvar stays the exact k-worst mean (the review's -10,-5,-5 case)."""
    term = np.array([[-10.0], [-5.0], [-5.0]], np.float32)
    att = cvar_attribution(term, np.array([1.0]), alpha=0.5)   # k = 2
    np.testing.assert_allclose(att.var, -5.0, atol=1e-7)
    np.testing.assert_allclose(att.cvar, -7.5, atol=1e-6)      # (-10 + -5)/2
    np.testing.assert_allclose(att.contributions.sum(), att.cvar, rtol=1e-10)


def test_simulated_composes():
    chol = np.linalg.cholesky(4e-4 * (0.6 * np.eye(A) + 0.4)).astype(np.float32)
    params = GBMParams(s0=np.ones(A) * 100,
                       mean_step=np.full(A, 1e-3, np.float32), chol_step=chol)
    att = simulated_cvar_attribution(jax.random.key(0), params,
                                     np.full(A, 0.25), n_paths=16_384,
                                     n_steps=13)
    np.testing.assert_allclose(att.contributions.sum(), att.cvar, rtol=1e-8)
    assert att.cvar < att.var < 0.0
