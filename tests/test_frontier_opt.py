"""Exact projected-gradient frontier: projection KKT, analytic oracles, and
dominance over random search."""

import numpy as np
import pytest

from mcport.engine.frontier_opt import (
    ExactFrontier,
    exact_frontier,
    max_sharpe_exact,
    min_variance_exact,
    project_capped_simplex,
    target_risk_exact,
)

A = 5


@pytest.fixture(scope="module")
def market():
    rng = np.random.default_rng(40)  # local: immune to suite draw order
    mu = rng.uniform(0.05, 0.45, A)
    q = rng.normal(0, 1, (A, A))
    sigma = q @ q.T / A * 0.04 + 0.01 * np.eye(A)
    return mu, sigma


def test_projection_is_feasible_and_optimal():
    rng = np.random.default_rng(44)
    lo = np.full(A, 0.05)
    hi = np.full(A, 0.5)
    for _ in range(5):
        y = rng.normal(0, 1, A)
        w = np.asarray(project_capped_simplex(y, lo, hi))
        assert abs(w.sum() - 1) < 1e-9
        assert (w >= lo - 1e-9).all() and (w <= hi + 1e-9).all()
        # optimality vs random feasible perturbations (projection minimizes
        # ||w - y||; any feasible z must be at least as far)
        for _ in range(50):
            d = rng.normal(0, 0.02, A)
            z = np.asarray(project_capped_simplex(w + d, lo, hi))
            assert np.sum((w - y) ** 2) <= np.sum((z - y) ** 2) + 1e-9


def test_min_variance_matches_closed_form():
    """Unconstrained-in-the-box minimum variance: w* = Σ^-1 1 / (1'Σ^-1 1)
    when interior to [0,1] — guaranteed by a well-conditioned Σ here."""
    sigma = 0.04 * (0.3 * np.ones((A, A)) + np.diag(np.linspace(0.7, 1.3, A)))
    ones = np.ones(A)
    w_star = np.linalg.solve(sigma, ones)
    w_star /= w_star.sum()
    assert (w_star > 0).all() and (w_star < 1).all()
    f = exact_frontier(np.zeros(A), sigma, n_lambda=4)
    w, _, _ = min_variance_exact(f)
    np.testing.assert_allclose(w, w_star, atol=5e-5)


def test_two_asset_max_sharpe_vs_dense_grid():
    mu = np.array([0.10, 0.30])
    sigma = np.array([[0.04, 0.01], [0.01, 0.09]])
    f = exact_frontier(mu, sigma, risk_free=0.03, n_lambda=128, n_iter=800)
    w, ret, std = max_sharpe_exact(f)
    # dense scan of the 1-D simplex
    t = np.linspace(0, 1, 200_001)
    ws = np.stack([t, 1 - t], axis=1)
    rets = ws @ mu
    stds = np.sqrt(np.einsum("na,ab,nb->n", ws, sigma, ws))
    sharpes = (rets - 0.03) / stds
    best = sharpes.max()
    got = (ret - 0.03) / std
    assert got >= best - 1e-5


def test_constraints_respected_and_frontier_monotone(market):
    mu, sigma = market
    lo = np.full(A, 0.05)
    hi = np.full(A, 0.4)
    f = exact_frontier(mu, sigma, lo, hi, risk_free=0.02)
    assert (f.weights >= lo - 1e-7).all() and (f.weights <= hi + 1e-7).all()
    np.testing.assert_allclose(f.weights.sum(axis=1), 1.0, atol=1e-8)
    # return and risk are (weakly) increasing along the lam sweep
    assert np.all(np.diff(f.ret) > -1e-6)
    assert np.all(np.diff(f.std) > -1e-6)


def test_exact_dominates_random_search(market):
    """The whole point: the exact max-Sharpe must beat 100k random candidates."""
    import jax

    from mcport.ops.dirichlet import sample_weights

    mu, sigma = market
    f = exact_frontier(mu, sigma, risk_free=0.03)
    _, ret, std = max_sharpe_exact(f)
    exact_sharpe = (ret - 0.03) / std

    w, _ = sample_weights(jax.random.key(0), 100_000, np.zeros(A), np.ones(A))
    w = np.asarray(w, np.float64)
    rets = w @ mu
    stds = np.sqrt(np.einsum("na,ab,nb->n", w, sigma, w))
    rand_best = ((rets - 0.03) / stds).max()
    assert exact_sharpe >= rand_best - 1e-6


def test_target_risk_semantics(market):
    mu, sigma = market
    f = exact_frontier(mu, sigma)
    w, ret, std = target_risk_exact(f, target=float(np.median(f.std)))
    assert std <= np.median(f.std) + 1e-9
    tiny = target_risk_exact(f, target=1e-6)  # infeasible → nearest fallback
    assert tiny[2] == pytest.approx(f.std.min())


def test_infeasible_bounds_raise(market):
    mu, sigma = market
    with pytest.raises(ValueError, match="infeasible"):
        exact_frontier(mu, sigma, min_weights=np.full(A, 0.5))
