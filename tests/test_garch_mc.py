"""CCC-GARCH Monte Carlo: estimation recovery, simulation laws, vol clustering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.models.garch_mc import (
    CCCGarchParams,
    estimate_ccc_garch,
    garch_terminal_returns,
    simulate_garch_returns,
)

A = 2
TRUE = CCCGarchParams(
    mu=np.array([5e-4, 1e-3]),
    omega=np.array([4e-6, 6e-6]),
    alpha=np.array([0.08, 0.12]),
    beta=np.array([0.88, 0.82]),
    corr_chol=np.linalg.cholesky(np.array([[1.0, 0.6], [0.6, 1.0]])),
    sigma2_0=np.array([1e-4, 2e-4]),
    eps2_0=np.array([1e-4, 2e-4]),
)


def test_estimator_recovers_parameters():
    _, paths = simulate_garch_returns(jax.random.key(0), TRUE, 1, 6000,
                                      full_paths=True, dtype=jnp.float64)
    r = np.asarray(paths)[0]                      # one long (T, A) sample
    est = estimate_ccc_garch(r)
    np.testing.assert_allclose(est.alpha, TRUE.alpha, atol=0.06)
    np.testing.assert_allclose(est.beta, TRUE.beta, atol=0.10)
    corr_true = TRUE.corr_chol @ TRUE.corr_chol.T
    corr_est = est.corr_chol @ est.corr_chol.T
    np.testing.assert_allclose(corr_est[0, 1], corr_true[0, 1], atol=0.06)


def test_unconditional_moments():
    """Long-run variance of simulated returns matches omega/(1-alpha-beta)."""
    n, steps = 8_192, 400
    _, paths = simulate_garch_returns(jax.random.key(1), TRUE, n, steps,
                                      full_paths=True, dtype=jnp.float64)
    r = np.asarray(paths)[:, steps // 2:, :]      # discard burn-in
    want_var = TRUE.omega / (1 - TRUE.alpha - TRUE.beta)
    got_var = r.var(axis=(0, 1))
    np.testing.assert_allclose(got_var, want_var, rtol=0.10)
    np.testing.assert_allclose(r.mean(axis=(0, 1)), TRUE.mu, atol=5e-5)
    # cross-asset correlation of returns ~ CCC R (for small mu)
    flat = r.reshape(-1, A)
    np.testing.assert_allclose(np.corrcoef(flat, rowvar=False)[0, 1], 0.6, atol=0.05)


def test_volatility_clustering():
    """|r_t| autocorrelation is positive under GARCH, ~zero under iid normals."""
    _, paths = simulate_garch_returns(jax.random.key(2), TRUE, 1, 4000,
                                      full_paths=True, dtype=jnp.float64)
    r = np.asarray(paths)[0, :, 0]
    a = np.abs(r) - np.abs(r).mean()
    acf1 = (a[1:] * a[:-1]).mean() / (a**2).mean()
    assert acf1 > 0.05
    iid = np.random.default_rng(0).normal(0, r.std(), r.size)
    b = np.abs(iid) - np.abs(iid).mean()
    acf1_iid = (b[1:] * b[:-1]).mean() / (b**2).mean()
    assert acf1 > acf1_iid + 0.04


def test_terminal_equals_compounded_paths():
    term, paths = simulate_garch_returns(jax.random.key(3), TRUE, 64, 16,
                                         full_paths=True, dtype=jnp.float64)
    want = np.prod(1.0 + np.asarray(paths), axis=1) - 1.0
    np.testing.assert_allclose(np.asarray(term), want, atol=1e-12)
    only_term = garch_terminal_returns(jax.random.key(3), TRUE, 64, 16, jnp.float64)
    np.testing.assert_allclose(np.asarray(only_term), np.asarray(term), atol=1e-12)


def test_garch_fatter_tails_than_gbm():
    """Same unconditional variance, fatter tails under GARCH — the reason the
    model family matters for VaR."""
    n, steps = 30_000, 64
    term = np.asarray(garch_terminal_returns(jax.random.key(4), TRUE, n, steps,
                                             jnp.float64))
    w = np.full(A, 0.5)
    port = term @ w
    # matched constant-vol normal benchmark
    var_match = (TRUE.omega / (1 - TRUE.alpha - TRUE.beta))
    z = np.random.default_rng(1).standard_normal((n, A))
    chol = TRUE.corr_chol
    iid = TRUE.mu * steps + np.sqrt(var_match * steps) * (z @ chol.T)
    port_iid = iid @ w
    q_garch = np.percentile(port, 0.5)
    q_iid = np.percentile(port_iid, 0.5)
    assert q_garch < q_iid  # deeper extreme tail under stochastic vol


def test_estimator_input_validation():
    with pytest.raises(ValueError):
        estimate_ccc_garch(np.zeros((5, 2)))


def test_garch_t_shocks_fatter_tails():
    """GARCH-t vs GARCH-normal at identical params: same conditional variance
    process law (unit-variance shocks) but fatter terminal tails."""
    import jax
    import jax.numpy as jnp

    from mcport.models.garch_mc import garch_terminal_returns

    p = TRUE
    n, steps = 200_000, 26
    t_n = np.asarray(garch_terminal_returns(jax.random.key(0), p, n, steps,
                                            dtype=jnp.float64))
    t_t = np.asarray(garch_terminal_returns(jax.random.key(0), p, n, steps,
                                            dtype=jnp.float64, t_df=4.8))
    # matched scale within MC error
    assert abs(t_t[:, 0].std() / t_n[:, 0].std() - 1) < 0.10
    # deep lower tail fatter under t
    assert np.quantile(t_t[:, 0], 0.001) < np.quantile(t_n[:, 0], 0.001)
    z_t = (t_t[:, 0] - t_t[:, 0].mean()) / t_t[:, 0].std()
    z_n = (t_n[:, 0] - t_n[:, 0].mean()) / t_n[:, 0].std()
    assert np.mean(z_t**4) > np.mean(z_n**4)
