"""Exact mean-CVaR frontier (engine.cvar_opt) vs brute force and random search.

The Rockafellar-Uryasev program is convex, so its optimum must (a) match a
fine brute-force grid on a 2-asset problem, (b) weakly beat ANY random
candidate cloud on the same scenarios, and (c) trace a monotone frontier.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.engine.cvar_opt import (
    cvar_frontier,
    exact_tail_metrics,
    max_return_at_cvar,
    min_cvar_exact,
    simulated_cvar_frontier,
)
from mcport.models.gbm import GBMParams

ALPHA = 0.95


def _scenarios(n=4096, a=4, seed=0):
    rng = np.random.default_rng(seed)
    # heterogeneous vols/means + common factor => a non-trivial tail optimum
    common = rng.standard_normal((n, 1))
    idio = rng.standard_normal((n, a))
    vol = np.linspace(0.02, 0.12, a)
    mu = np.linspace(0.0, 0.004, a)
    return mu + vol * (0.6 * common + 0.8 * idio)


def _exact_cvar(r, w, alpha=ALPHA):
    port = r @ w
    k = max(1, math.ceil((1 - alpha) * len(port)))
    worst = np.sort(port)[:k]
    return worst.mean()


def test_min_cvar_matches_bruteforce_grid_2asset():
    r = _scenarios(a=2, seed=1)
    fr = cvar_frontier(r, alpha=ALPHA, n_lambda=5, n_stages=6, n_iter=200)
    w_opt, _, cvar_opt = min_cvar_exact(fr)

    grid = np.linspace(0.0, 1.0, 2001)
    cvars = np.array([_exact_cvar(r, np.array([g, 1 - g])) for g in grid])
    best = cvars.max()
    # convex program must land within grid resolution of the global optimum
    assert cvar_opt >= best - 5e-5
    g_best = grid[np.argmax(cvars)]
    assert abs(w_opt[0] - g_best) < 0.01


def test_beats_random_search_cloud():
    r = _scenarios(a=6, seed=2)
    fr = cvar_frontier(r, alpha=ALPHA, n_lambda=5)
    _, _, cvar_opt = min_cvar_exact(fr)

    rng = np.random.default_rng(3)
    # keep the host-numpy oracle tiny (CLAUDE.md: unoptimized BLAS) — 400
    # candidates establish dominance just as well as 2k did
    w_cloud = rng.dirichlet(np.ones(6), size=400)
    port = r @ w_cloud.T
    k = max(1, math.ceil((1 - ALPHA) * r.shape[0]))
    cloud_cvar = np.partition(port, k, axis=0)[:k].mean(axis=0)
    assert cvar_opt >= cloud_cvar.max() - 1e-5


def test_frontier_monotone_and_feasible():
    r = _scenarios(a=5, seed=4)
    lo = np.full(5, 0.05)
    hi = np.full(5, 0.6)
    fr = cvar_frontier(r, min_weights=lo, max_weights=hi, alpha=ALPHA, n_lambda=17)

    np.testing.assert_allclose(fr.weights.sum(axis=1), 1.0, atol=1e-5)
    assert (fr.weights >= lo - 1e-5).all() and (fr.weights <= hi + 1e-5).all()
    # lam sweep is sorted: return weakly increases, tail loss weakly grows
    # (cvar in return convention weakly decreases); tolerate solver noise
    assert (np.diff(fr.ret) >= -2e-4).all()
    assert (np.diff(fr.cvar) <= 2e-4).all()
    # lam=0 point is the min-CVaR portfolio of the sweep
    assert fr.cvar[0] >= fr.cvar.max() - 2e-4


def test_reported_metrics_are_exact_topk():
    r = _scenarios(a=3, seed=5)
    fr = cvar_frontier(r, alpha=ALPHA, n_lambda=5)
    for i in range(len(fr.lams)):
        assert fr.cvar[i] == pytest.approx(_exact_cvar(r, fr.weights[i]), abs=1e-6)
    var_e, cvar_e = exact_tail_metrics(jnp.asarray(r), jnp.asarray(fr.weights), ALPHA)
    np.testing.assert_allclose(np.asarray(cvar_e), fr.cvar, atol=1e-6)
    assert (np.asarray(var_e) >= fr.cvar - 1e-9).all()   # CVaR <= VaR in returns


def test_max_return_at_cvar_budget_logic():
    r = _scenarios(a=4, seed=6)
    fr = cvar_frontier(r, alpha=ALPHA, n_lambda=17)
    loose = fr.cvar.min() - 0.01          # everything feasible
    w, ret, cv = max_return_at_cvar(fr, loose)
    assert ret == pytest.approx(fr.ret.max(), abs=1e-6)
    tight = fr.cvar.max() - 1e-4          # only near-min-CVaR points feasible
    w2, ret2, cv2 = max_return_at_cvar(fr, tight)
    assert cv2 >= tight - 1e-6
    impossible = fr.cvar.max() + 1.0      # nothing feasible -> nearest fallback
    _, _, cv3 = max_return_at_cvar(fr, impossible)
    assert cv3 == pytest.approx(fr.cvar.max(), abs=1e-6)


def test_simulated_frontier_composes_with_gbm_params():
    a = 3
    vol = np.array([0.02, 0.05, 0.09])
    params = GBMParams(
        s0=np.ones(a),
        mean_step=np.array([0.0005, 0.001, 0.002]),
        chol_step=np.diag(vol),
    )
    fr = simulated_cvar_frontier(
        jax.random.PRNGKey(0), params, n_paths=4096, n_steps=16,
        alpha=ALPHA, n_lambda=9,
    )
    assert fr.weights.shape == (9, a)
    np.testing.assert_allclose(fr.weights.sum(axis=1), 1.0, atol=1e-4)
    # min-CVaR leans toward the low-vol asset; max-return end toward high-mu
    w_min, _, _ = min_cvar_exact(fr)
    assert w_min[0] > 0.5
    assert fr.weights[-1, 2] > 0.9
