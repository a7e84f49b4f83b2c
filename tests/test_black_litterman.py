"""Black-Litterman posterior (engine.black_litterman)."""

import numpy as np
import pytest

from mcport.engine.black_litterman import (
    absolute_view,
    black_litterman,
    implied_equilibrium_returns,
    posterior_frontier,
    relative_view,
)

A = 4
COV = 0.04 * (0.6 * np.eye(A) + 0.4 * np.ones((A, A))) * np.outer(
    np.linspace(0.8, 1.4, A), np.linspace(0.8, 1.4, A))
W_MKT = np.array([0.4, 0.3, 0.2, 0.1])


def test_no_views_returns_equilibrium_exactly():
    post = black_litterman(COV, W_MKT, tau=0.05)
    np.testing.assert_allclose(post.mu, implied_equilibrium_returns(COV, W_MKT),
                               rtol=1e-14)
    np.testing.assert_allclose(post.cov, 1.05 * COV, rtol=1e-14)
    # reverse optimization: unconstrained MV weights at delta reproduce w_mkt
    w_back = np.linalg.solve(2.5 * COV, post.pi)
    np.testing.assert_allclose(w_back, W_MKT, rtol=1e-10)


def test_certain_view_is_honored_exactly():
    """Omega -> 0 forces P mu_BL = q."""
    p, q = absolute_view(0, 0.20, A)
    post = black_litterman(COV, W_MKT, p, [q], omega=np.array([[1e-12]]))
    np.testing.assert_allclose(post.mu[0], 0.20, atol=1e-6)


def test_view_tilts_toward_target_and_shrinks_uncertainty():
    pi = implied_equilibrium_returns(COV, W_MKT)
    p, q = relative_view(0, 1, pi[0] - pi[1] + 0.05, A)   # 0 beats 1 by +5%
    post = black_litterman(COV, W_MKT, p, [q])
    spread_prior = pi[0] - pi[1]
    spread_post = post.mu[0] - post.mu[1]
    assert spread_prior < spread_post < q                  # partial update
    # posterior covariance is between Sigma and (1+tau) Sigma in PSD order
    assert np.all(np.linalg.eigvalsh(post.cov - COV) >= -1e-12)
    assert np.all(np.linalg.eigvalsh((1.05) * COV - post.cov) >= -1e-12)


def test_posterior_frontier_tilts_weights():
    """An optimistic view on asset 3 moves the max-Sharpe allocation there."""
    from mcport.engine.frontier_opt import max_sharpe_exact

    base = posterior_frontier(black_litterman(COV, W_MKT))
    p, q = absolute_view(3, 0.60, A)
    tilted = posterior_frontier(black_litterman(COV, W_MKT, p, [q]))
    w0, _, _ = max_sharpe_exact(base)
    w1, _, _ = max_sharpe_exact(tilted)
    assert w1[3] > w0[3] + 0.05


def test_guards():
    with pytest.raises(ValueError):
        black_litterman(COV, np.array([0.5, 0.5, 0.5, 0.5]))
    with pytest.raises(ValueError):
        black_litterman(COV, W_MKT, np.zeros((1, A + 1)), [0.1])
