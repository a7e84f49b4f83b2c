"""Exact mean-CDaR frontier (engine.cdar_opt) vs brute force and random search.

Convexity obligations mirror test_cvar_opt: the CUZ drawdown program must
(a) match a fine brute-force grid on a 2-asset path, (b) weakly beat any
random candidate cloud on the same path, and (c) report exact metrics.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from mcport.engine.cdar_opt import (
    cdar_frontier,
    exact_cdar_metrics,
    max_return_at_cdar,
    min_cdar_exact,
    simulated_cdar_frontier,
)
from mcport.models.gbm import GBMParams

ALPHA = 0.9


def _path(t=600, a=4, seed=0):
    rng = np.random.default_rng(seed)
    common = rng.standard_normal((t, 1))
    idio = rng.standard_normal((t, a))
    vol = np.linspace(0.01, 0.05, a)
    mu = np.linspace(0.0005, 0.002, a)
    return mu + vol * (0.5 * common + 0.9 * idio)


def _exact_cdar(r, w, alpha=ALPHA):
    cum = np.cumsum(r @ w)
    dd = np.maximum.accumulate(cum) - cum
    k = max(1, math.ceil((1 - alpha) * len(dd)))
    return np.sort(dd)[-k:].mean()


def test_min_cdar_matches_bruteforce_grid_2asset():
    r = _path(a=2, seed=1)
    fr = cdar_frontier(r, alpha=ALPHA, n_lambda=5, n_stages=6, n_iter=200)
    w_opt, _, cdar_opt = min_cdar_exact(fr)

    grid = np.linspace(0.0, 1.0, 2001)
    cdars = np.array([_exact_cdar(r, np.array([g, 1 - g])) for g in grid])
    best = cdars.min()
    assert cdar_opt <= best + 5e-5
    g_best = grid[np.argmin(cdars)]
    assert abs(w_opt[0] - g_best) < 0.02


def test_beats_random_search_cloud():
    r = _path(a=6, seed=2)
    fr = cdar_frontier(r, alpha=ALPHA, n_lambda=5)
    _, _, cdar_opt = min_cdar_exact(fr)
    w_cloud = np.asarray(
        jax.random.dirichlet(jax.random.key(0), jnp.ones(6), (400,)))
    cloud = np.array([_exact_cdar(r, w) for w in w_cloud])
    assert cdar_opt <= cloud.min() + 1e-5


def test_frontier_monotone_and_exact_metrics():
    r = _path(a=5, seed=3)
    lo, hi = np.zeros(5), np.full(5, 0.6)
    fr = cdar_frontier(r, min_weights=lo, max_weights=hi, alpha=ALPHA,
                       n_lambda=9)
    # bounds respected, simplex valid
    assert (fr.weights >= -1e-6).all() and (fr.weights <= 0.6 + 1e-6).all()
    np.testing.assert_allclose(fr.weights.sum(axis=1), 1.0, atol=1e-5)
    # higher lam => return never decreases materially along the sweep
    assert fr.ret[-1] >= fr.ret[0] - 1e-9
    assert fr.cdar[-1] >= fr.cdar[0] - 1e-6   # risk paid for return
    # reported metrics are exact recomputations
    for i in (0, len(fr.lams) - 1):
        want = _exact_cdar(r, fr.weights[i])
        np.testing.assert_allclose(fr.cdar[i], want, atol=2e-6)
        cum = np.cumsum(r @ fr.weights[i])
        mdd = (np.maximum.accumulate(cum) - cum).max()
        np.testing.assert_allclose(fr.max_dd[i], mdd, atol=2e-6)
    assert (fr.max_dd >= fr.cdar - 1e-9).all()


def test_budget_pick_logic():
    r = _path(a=4, seed=4)
    fr = cdar_frontier(r, alpha=ALPHA, n_lambda=9)
    w, ret, cdar = max_return_at_cdar(fr, budget=float(fr.cdar.max()))
    assert cdar <= fr.cdar.max() + 1e-12
    # loosest budget => the highest-return frontier point is feasible
    assert ret >= fr.ret.max() - 1e-9
    # impossible budget falls back to nearest
    w2, _, cdar2 = max_return_at_cdar(fr, budget=1e-9)
    assert abs(cdar2 - fr.cdar.min()) < 1e-9


def test_simulated_composes_with_gbm_params():
    a = 3
    chol = np.linalg.cholesky(4e-4 * (0.6 * np.eye(a) + 0.4)).astype(np.float32)
    params = GBMParams(s0=np.ones(a) * 100,
                       mean_step=np.full(a, 1e-3, np.float32), chol_step=chol)
    fr = simulated_cdar_frontier(jax.random.key(0), params, n_steps=128,
                                 alpha=ALPHA, n_lambda=5)
    assert np.isfinite(fr.cdar).all() and (fr.cdar >= 0).all()
    np.testing.assert_allclose(fr.weights.sum(axis=1), 1.0, atol=1e-5)


def test_exact_cdar_metrics_batched():
    r = _path(a=3, seed=5)
    ws = np.asarray(jax.random.dirichlet(jax.random.key(1), jnp.ones(3), (8,)))
    cdar, mdd = exact_cdar_metrics(jnp.asarray(r, jnp.float32),
                                   jnp.asarray(ws, jnp.float32), ALPHA)
    for i in range(8):
        np.testing.assert_allclose(float(cdar[i]), _exact_cdar(r, ws[i]), atol=2e-6)
