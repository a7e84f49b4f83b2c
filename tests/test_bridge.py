"""Brownian-bridge QMC paths: distributional correctness + convergence advantage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.models.bridge import bridge_schedule, brownian_bridge, qmc_gbm_log_paths
from mcport.models.gbm import simulate_log_paths


def test_schedule_covers_all_times():
    for T in (1, 2, 7, 16, 252):
        s = bridge_schedule(T)
        assert sorted(s.t.tolist()) == list(range(1, T + 1))
        assert s.t[0] == T  # terminal first
        # anchors always already-known times (or the origin)
        seen = {0}
        for k in range(T):
            assert s.l[k] in seen and s.r[k] in seen
            seen.add(int(s.t[k]))


def test_bridge_is_standard_brownian_motion(rng):
    """cov(W_s, W_t) == min(s, t) within MC error when fed iid normals."""
    n, T = 40_000, 8
    z = jnp.asarray(rng.normal(size=(n, T, 1)))
    w = np.asarray(brownian_bridge(z, T))[:, :, 0]
    for t in range(T):
        np.testing.assert_allclose(w[:, t].var(), t + 1, rtol=0.05)
    for s, t in [(0, 3), (2, 6), (1, 7)]:
        emp = np.cov(w[:, s], w[:, t])[0, 1]
        np.testing.assert_allclose(emp, min(s, t) + 1, rtol=0.08)
    # increments are independent: corr(dW_1, dW_2) ~ 0
    dw = np.diff(np.concatenate([np.zeros((n, 1)), w], axis=1), axis=1)
    corr = np.corrcoef(dw.T)
    off = corr[~np.eye(T, dtype=bool)]
    assert np.abs(off).max() < 0.03


def test_qmc_paths_match_mc_distribution(rng):
    a = 3
    chol = np.linalg.cholesky(0.0004 * (0.6 * np.eye(a) + 0.4))
    mean = np.array([1e-3, 2e-3, -5e-4])
    n, T = 16_384, 16
    qmc = np.asarray(qmc_gbm_log_paths(mean, chol, n, T, "sobol", seed=0, dtype=jnp.float64))
    mc = np.asarray(simulate_log_paths(jax.random.key(0), mean, chol, n, T, dtype=jnp.float64))
    want_cov = (chol @ chol.T) * T
    np.testing.assert_allclose(qmc[:, -1].mean(0), mean * T, atol=4 * np.sqrt(want_cov.max() / n))
    np.testing.assert_allclose(np.cov(qmc[:, -1], rowvar=False), want_cov, rtol=0.08)
    np.testing.assert_allclose(mc[:, -1].std(0), qmc[:, -1].std(0), rtol=0.05)
    # intermediate marginals too: t = T/2
    np.testing.assert_allclose(
        np.cov(qmc[:, T // 2 - 1], rowvar=False), want_cov / 2, rtol=0.1, atol=1e-5
    )


def test_bridge_qmc_beats_mc_on_path_dependent_payoff(rng):
    """Asian-style payoff (mean of the portfolio path) converges faster under
    bridge-ordered Sobol than plain MC — the point of the construction."""
    a = 2
    chol = np.linalg.cholesky(0.0009 * (0.7 * np.eye(a) + 0.3))
    mean = np.array([5e-4, 1e-3])
    w = np.array([0.5, 0.5])
    n, T = 4_096, 16

    def asian(paths):  # (n, T, A) log paths -> mean over time of portfolio value
        v = (np.exp(paths) * w).sum(-1)
        return float(v.mean())

    qmc_est = [asian(np.asarray(qmc_gbm_log_paths(mean, chol, n, T, "sobol", seed=s,
                                                  dtype=jnp.float64)))
               for s in range(6)]
    mc_est = [asian(np.asarray(simulate_log_paths(jax.random.key(s), mean, chol, n, T,
                                                  dtype=jnp.float64)))
              for s in range(6)]
    assert np.std(qmc_est) < np.std(mc_est)


def test_non_power_of_two_steps():
    a = 2
    chol = 0.01 * np.eye(a)
    out = qmc_gbm_log_paths(np.zeros(a), chol, 256, 13, "halton", seed=1)
    assert out.shape == (256, 13, a)
    assert bool(jnp.isfinite(out).all())
