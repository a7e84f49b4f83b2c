"""Full objective parity of the mesh-sharded weight search (VERDICT r1 item 5).

Drives the BASELINE.json config-3 search — 1M candidates, 30% target risk —
through the 8-device CPU mesh and asserts EXACT equality against a single-device
replay of the identical per-device candidate streams with the single-chip
selection semantics (weight_search._select_optimum). Also covers the var/cvar
objectives, the Equal-Weight objective, and the no-valid-candidate guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.engine.weight_search import evaluate_portfolios
from mcport.ops.dirichlet import sample_constrained_weights
from mcport.parallel.mesh import make_mesh
from mcport.parallel.sharded_mc import sharded_weight_search

A = 15
T = 104
N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    return make_mesh()


@pytest.fixture(scope="module")
def universe():
    rng = np.random.default_rng(43)  # local: immune to suite draw order
    rets = rng.normal(0.008, 0.06, (T, A)).astype(np.float32)
    mean_ann = (rets.mean(0) * 12).astype(np.float32)
    cov_ann = (np.cov(rets, rowvar=False, ddof=1) * 12).astype(np.float32)
    return rets, mean_ann, cov_ann


def _replay(key, n_candidates, min_w, max_w, rets, mean_ann, cov_ann, risk_free):
    """Single-device replay of the mesh's exact per-device candidate streams."""
    ws, valids, evs = [], [], []
    n_local = n_candidates // N_DEV
    for dev in range(N_DEV):
        k = jax.random.fold_in(key, dev)
        wd, valid = sample_constrained_weights(k, n_local, min_w, max_w)
        wd = np.asarray(wd, np.float32)
        ev = evaluate_portfolios(wd, rets, mean_ann, cov_ann, risk_free=risk_free)
        ws.append(wd)
        valids.append(np.asarray(valid))
        evs.append(ev)
    w = np.concatenate(ws)
    valid = np.concatenate(valids)
    ret = np.concatenate([np.asarray(e.ret) for e in evs])
    std = np.concatenate([np.asarray(e.std) for e in evs])
    sharpe = np.concatenate([np.asarray(e.sharpe) for e in evs])
    var = np.concatenate([np.asarray(e.var_95) for e in evs])
    cvar = np.concatenate([np.asarray(e.cvar_95) for e in evs])
    return w, valid, ret, std, sharpe, var, cvar


def test_config3_target_risk_1m_exact_vs_single_chip(mesh, universe):
    """BASELINE config 3: 1M constrained candidates, 30% target risk, 8-dev mesh."""
    rets, mean_ann, cov_ann = universe
    n = 1_048_576
    min_w = np.zeros(A, np.float32)
    max_w = np.full(A, 0.35, np.float32)          # real constraints, not trivial
    key = jax.random.key(3)

    res = sharded_weight_search(
        key, rets, mean_ann, cov_ann, n_candidates=n, mesh=mesh,
        min_weights=min_w, max_weights=max_w, risk_free=0.03,
        objective="target_risk", target_risk=0.30, axis="paths",
    )
    assert int(res.n_valid) > 0

    w, valid, ret, std, _, _, _ = _replay(
        key, n, min_w, max_w, rets, mean_ann, cov_ann, 0.03
    )
    assert int(res.n_valid) == int(valid.sum())
    # single-chip selection semantics (weight_search._select_optimum):
    feasible = valid & (std <= 0.30)
    if feasible.any():
        i = int(np.argmax(np.where(feasible, ret, -np.inf)))
    else:
        i = int(np.argmin(np.where(valid, np.abs(std - 0.30), np.inf)))
    np.testing.assert_array_equal(np.asarray(res.weights), w[i])
    assert float(res.metric) == ret[i]
    assert std[i] <= 0.30 or not feasible.any()


@pytest.mark.parametrize("objective", ["sharpe", "var_95", "cvar_95"])
def test_metric_objectives_exact_vs_single_chip(mesh, universe, objective):
    rets, mean_ann, cov_ann = universe
    n = 65_536
    min_w = np.zeros(A, np.float32)
    max_w = np.full(A, 0.5, np.float32)
    key = jax.random.key(7)
    res = sharded_weight_search(
        key, rets, mean_ann, cov_ann, n_candidates=n, mesh=mesh,
        min_weights=min_w, max_weights=max_w, risk_free=0.03,
        objective=objective, axis="paths",
    )
    w, valid, ret, std, sharpe, var, cvar = _replay(
        key, n, min_w, max_w, rets, mean_ann, cov_ann, 0.03
    )
    metric = {"sharpe": sharpe, "var_95": var, "cvar_95": cvar}[objective]
    i = int(np.argmax(np.where(valid, metric, -np.inf)))
    np.testing.assert_array_equal(np.asarray(res.weights), w[i])
    assert float(res.metric) == metric[i]


def test_target_risk_nearest_fallback(mesh, universe):
    """No candidate can reach std <= 1e-4 → the nearest-to-target fallback."""
    rets, mean_ann, cov_ann = universe
    n = 8_192
    min_w = np.zeros(A, np.float32)
    max_w = np.ones(A, np.float32)
    key = jax.random.key(11)
    res = sharded_weight_search(
        key, rets, mean_ann, cov_ann, n_candidates=n, mesh=mesh,
        min_weights=min_w, max_weights=max_w,
        objective="target_risk", target_risk=1e-4, axis="paths",
    )
    w, valid, ret, std, *_ = _replay(key, n, min_w, max_w, rets, mean_ann, cov_ann, 0.0)
    assert not (std <= 1e-4).any()
    i = int(np.argmin(np.where(valid, np.abs(std - 1e-4), np.inf)))
    np.testing.assert_array_equal(np.asarray(res.weights), w[i])
    assert float(res.metric) == ret[i]


def test_equal_weight_objective(mesh, universe):
    rets, mean_ann, cov_ann = universe
    res = sharded_weight_search(
        jax.random.key(0), rets, mean_ann, cov_ann, n_candidates=N_DEV, mesh=mesh,
        min_weights=np.zeros(A, np.float32), max_weights=np.ones(A, np.float32),
        risk_free=0.03, objective="equal_weight", axis="paths",
    )
    np.testing.assert_allclose(np.asarray(res.weights), np.full(A, 1.0 / A), atol=1e-7)
    ev = evaluate_portfolios(np.full((1, A), 1.0 / A, np.float32), rets,
                             mean_ann, cov_ann, risk_free=0.03)
    assert float(res.metric) == float(np.asarray(ev.sharpe)[0])
    assert int(res.n_valid) == N_DEV  # the replicated EW candidate, once per device


def test_no_valid_guard_returns_nan_not_crash(mesh, universe):
    """The reference crashes with IndexError when constraints exclude everything
    (app.py:747, SURVEY.md §2); the sharded engine reports n_valid=0 instead."""
    rets, mean_ann, cov_ann = universe
    # infeasible: every weight must exceed 0.2 → sum >= 3
    min_w = np.full(A, 0.2, np.float32)
    max_w = np.ones(A, np.float32)
    for objective in ("sharpe", "target_risk", "equal_weight"):
        res = sharded_weight_search(
            jax.random.key(1), rets, mean_ann, cov_ann, n_candidates=8_192,
            mesh=mesh, min_weights=min_w, max_weights=max_w,
            objective=objective, axis="paths",
        )
        assert int(res.n_valid) == 0
        assert np.isnan(np.asarray(res.weights)).all()
        assert float(res.metric) == -np.inf


def test_unknown_objective_raises(mesh, universe):
    rets, mean_ann, cov_ann = universe
    with pytest.raises(ValueError, match="objective"):
        sharded_weight_search(
            jax.random.key(0), rets, mean_ann, cov_ann, n_candidates=8,
            mesh=mesh, min_weights=np.zeros(A), max_weights=np.ones(A),
            objective="nope", axis="paths",
        )
