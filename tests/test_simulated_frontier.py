"""Simulated-path frontier search: oracle checks, objective semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.engine.simulated_frontier import simulated_weight_search
from mcport.models.gbm import GBMParams, terminal_log_returns

A = 3
PARAMS = GBMParams(
    s0=np.ones(A) * 100,
    mean_step=np.array([0.003, 0.001, 0.002]),
    chol_step=np.linalg.cholesky(0.0009 * (0.5 * np.eye(A) + 0.5)),
)


def test_scores_match_numpy_oracle():
    """Recompute one candidate's simulated metrics by hand."""
    key = jax.random.key(0)
    r = simulated_weight_search(
        key, PARAMS, n_candidates=64, n_paths=4096, n_steps=8,
        objective="cvar", cand_block=16, dtype=jnp.float64,
    )
    # replay the exact terminal draws
    k_path, _ = jax.random.split(key)
    term = np.asarray(terminal_log_returns(
        k_path, PARAMS.mean_step, PARAMS.chol_step, 4096, 8, dtype=jnp.float64))
    gross = np.exp(term) - 1.0
    for i in (0, 17, 63):
        port = gross @ r.weights[i]
        np.testing.assert_allclose(r.ret[i], port.mean(), atol=1e-9)
        np.testing.assert_allclose(r.std[i], port.std(ddof=1), atol=1e-9)
        k = int(np.ceil(0.05 * 4096))
        worst = np.sort(port)[:k]
        np.testing.assert_allclose(r.var[i], worst[-1], atol=1e-9)
        np.testing.assert_allclose(r.cvar[i], worst.mean(), atol=1e-9)


def test_objective_selection():
    r_cvar = simulated_weight_search(
        jax.random.key(1), PARAMS, n_candidates=512, n_paths=2048, n_steps=8,
        objective="cvar", dtype=jnp.float64,
    )
    assert r_cvar.opt_idx == int(np.argmax(np.where(r_cvar.valid, r_cvar.cvar, -np.inf)))
    r_sharpe = simulated_weight_search(
        jax.random.key(1), PARAMS, n_candidates=512, n_paths=2048, n_steps=8,
        objective="sharpe", risk_free=0.01, dtype=jnp.float64,
    )
    assert r_sharpe.opt_idx == int(np.argmax(r_sharpe.sharpe[r_sharpe.valid].max() == r_sharpe.sharpe))
    # the CVaR-optimal portfolio has better (larger) CVaR than the sharpe-optimal
    assert r_cvar.cvar[r_cvar.opt_idx] >= r_cvar.cvar[r_sharpe.opt_idx] - 1e-12


def test_cvar_leq_var_everywhere():
    r = simulated_weight_search(
        jax.random.key(2), PARAMS, n_candidates=256, n_paths=2048, n_steps=4,
        dtype=jnp.float64,
    )
    assert (r.cvar <= r.var + 1e-12).all()
    np.testing.assert_allclose(r.weights[r.valid].sum(1), 1.0, atol=1e-6)


def test_constraints_respected():
    min_w = np.array([0.2, 0.0, 0.0])
    r = simulated_weight_search(
        jax.random.key(3), PARAMS, n_candidates=256, n_paths=1024, n_steps=4,
        min_weights=min_w, dtype=jnp.float64,
    )
    assert r.valid.any()
    assert (r.weights[r.valid][:, 0] >= 0.2 - 1e-7).all()
    assert r.opt_weights[0] >= 0.2 - 1e-7


def test_bad_objective_raises():
    with pytest.raises(ValueError, match="objective"):
        simulated_weight_search(jax.random.key(0), PARAMS, n_candidates=8,
                                n_paths=128, n_steps=2, objective="sortino")
