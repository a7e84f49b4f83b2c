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


# ---- streaming form (constant compile cost; VERDICT r1 item 3) -----------------

def test_streaming_matches_bruteforce_replay():
    """Replay the streaming search's exact chunk streams and confirm the carried
    optimum equals the global argmax over all chunks."""
    import math

    from mcport.engine.simulated_frontier import simulated_weight_search_streaming
    from mcport.models.gbm import terminal_log_returns
    from mcport.ops.dirichlet import sample_constrained_weights

    key = jax.random.key(21)
    n_cand, block, n_paths, n_steps = 16_384, 2_048, 2_048, 16
    min_w = np.zeros(A, np.float32)
    max_w = np.full(A, 0.6, np.float32)
    res = simulated_weight_search_streaming(
        key, PARAMS, n_candidates=n_cand, n_paths=n_paths, n_steps=n_steps,
        objective="cvar", risk_free=0.01, min_weights=min_w, max_weights=max_w,
        cand_block=block, dispatch_chunks=3,   # deliberately ragged grouping
    )
    assert res.n_valid > 0

    k_path, k_w = jax.random.split(key)
    term = terminal_log_returns(
        k_path, jnp.asarray(PARAMS.mean_step, jnp.float32),
        jnp.asarray(PARAMS.chol_step, jnp.float32), n_paths, n_steps,
        dtype=jnp.float32,
    )
    gross = np.asarray(jnp.exp(term) - 1.0)
    k_tail = max(1, math.ceil(0.05 * n_paths))
    best_m, best_w = -np.inf, None
    n_valid = 0
    for c in range(n_cand // block):
        w, valid = sample_constrained_weights(
            jax.random.fold_in(k_w, c), block, min_w, max_w
        )
        w = np.asarray(w, np.float32)
        valid = np.asarray(valid)
        n_valid += int(valid.sum())
        port = gross @ w.T
        worst = np.sort(port, axis=0)[:k_tail]
        cvar = worst.mean(axis=0)
        cvar = np.where(valid, cvar, -np.inf)
        i = int(np.argmax(cvar))
        if cvar[i] > best_m:
            best_m, best_w = float(cvar[i]), w[i]
    assert res.n_valid == n_valid
    np.testing.assert_allclose(res.opt_weights, best_w, atol=1e-7)
    assert res.opt_metric == pytest.approx(best_m, rel=1e-5)


def test_streaming_independent_of_dispatch_grouping():
    from mcport.engine.simulated_frontier import simulated_weight_search_streaming

    kw = dict(n_candidates=8_192, n_paths=1_024, n_steps=8, objective="sharpe",
              cand_block=1_024, max_weights=np.full(A, 0.7, np.float32))
    a = simulated_weight_search_streaming(jax.random.key(5), PARAMS,
                                          dispatch_chunks=1, **kw)
    b = simulated_weight_search_streaming(jax.random.key(5), PARAMS,
                                          dispatch_chunks=8, **kw)
    np.testing.assert_array_equal(a.opt_weights, b.opt_weights)
    assert a.opt_metric == b.opt_metric and a.n_valid == b.n_valid


def test_streaming_rejects_bad_args():
    from mcport.engine.simulated_frontier import simulated_weight_search_streaming

    with pytest.raises(ValueError, match="objective"):
        simulated_weight_search_streaming(jax.random.key(0), PARAMS,
                                          n_candidates=128, cand_block=128,
                                          objective="nope")
    with pytest.raises(ValueError, match="divisible"):
        simulated_weight_search_streaming(jax.random.key(0), PARAMS,
                                          n_candidates=100, cand_block=64)
