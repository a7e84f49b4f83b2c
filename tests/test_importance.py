"""Importance-sampled deep-tail risk: unbiasedness, analytic oracle, MC win."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.models.gbm import GBMParams
from mcport.models.importance import importance_tail_risk, tilted_terminal_returns


def _single_asset(sigma_step=0.02, m_step=0.0005):
    return GBMParams(s0=np.ones(1), mean_step=np.array([m_step]),
                     chol_step=np.array([[sigma_step]]))


def test_lr_reweighting_is_unbiased():
    """E_theta[LR * f(z)] == E[f(z)]: the weighted mean terminal return matches
    the analytic mean within the (reduced) MC error."""
    p = _single_asset()
    n, steps = 200_000, 16
    term, log_lr = tilted_terminal_returns(
        jax.random.key(0), p.mean_step, p.chol_step, np.array([1.0]),
        3.0, n, steps, dtype=jnp.float64,
    )
    lr = np.asarray(jnp.exp(log_lr))
    x = np.asarray(term[:, 0])
    est = np.average(x, weights=lr)
    want = steps * p.mean_step[0]
    # weighted std error
    se = np.sqrt(np.average((x - est) ** 2 * lr, weights=lr) / (lr.sum()**2 / (lr**2).sum()))
    assert abs(est - want) < 6 * se


def test_deep_tail_var_matches_analytic_lognormal():
    """Single asset: terminal simple return is lognormal-1 with known exact
    quantiles; IS at alpha=0.9999 with 131k paths must hit it."""
    p = _single_asset()
    steps, alpha = 16, 0.9999
    mu_t = steps * float(p.mean_step[0])
    sd_t = np.sqrt(steps) * float(p.chol_step[0, 0])
    true_var = np.expm1(mu_t + sd_t * (-3.71901649))     # Phi^-1(1e-4)

    out = importance_tail_risk(jax.random.key(1), p, np.array([1.0]),
                               alpha=alpha, n_paths=131_072, n_steps=steps,
                               dtype=jnp.float64)
    got = float(out.var)
    assert abs(got - true_var) < 0.004 * abs(true_var) + 5e-4, (got, true_var)
    assert float(out.cvar) <= got
    assert int(out.n_tail_samples) > 20_000              # ~half the sample


def test_is_beats_plain_mc_at_extreme_alpha():
    """At alpha=0.9999, plain MC with the same path count has ~13 tail samples;
    the IS estimate must be substantially closer to the analytic quantile."""
    rng = np.random.default_rng(1234)  # local: immune to suite draw order
    p = _single_asset()
    steps, alpha, n = 16, 0.9999, 131_072
    mu_t = steps * float(p.mean_step[0])
    sd_t = np.sqrt(steps) * float(p.chol_step[0, 0])
    true_var = np.expm1(mu_t + sd_t * (-3.71901649))

    is_errs, mc_errs = [], []
    for s in range(5):
        out = importance_tail_risk(jax.random.key(s), p, np.array([1.0]),
                                   alpha=alpha, n_paths=n, n_steps=steps,
                                   dtype=jnp.float64)
        is_errs.append(abs(float(out.var) - true_var))
        z = rng.standard_normal(n)
        plain = np.expm1(mu_t + sd_t * z)
        mc_errs.append(abs(np.quantile(plain, 1 - alpha) - true_var))
    assert np.mean(is_errs) < 0.4 * np.mean(mc_errs), (np.mean(is_errs),
                                                       np.mean(mc_errs))


def test_zero_tilt_reduces_to_plain_mc():
    p = _single_asset()
    term, log_lr = tilted_terminal_returns(
        jax.random.key(2), p.mean_step, p.chol_step, np.array([1.0]),
        0.0, 4_096, 4)
    np.testing.assert_allclose(np.asarray(log_lr), 0.0, atol=1e-7)


def test_multi_asset_tilt_direction():
    """The tilt moves the PORTFOLIO down: tilted sample's mean portfolio return
    must sit far below the untilted mean."""
    a = 3
    p = GBMParams(s0=np.ones(a), mean_step=np.full(a, 1e-3),
                  chol_step=np.linalg.cholesky(4e-4 * (0.5 * np.eye(a) + 0.5)))
    w = np.array([0.5, 0.3, 0.2])
    t0, _ = tilted_terminal_returns(jax.random.key(3), p.mean_step, p.chol_step,
                                    w, 0.0, 32_768, 16)
    t3, _ = tilted_terminal_returns(jax.random.key(3), p.mean_step, p.chol_step,
                                    w, 3.0, 32_768, 16)
    p0 = float(((jnp.exp(t0) - 1.0) @ w).mean())
    p3 = float(((jnp.exp(t3) - 1.0) @ w).mean())
    assert p3 < p0 - 0.05
