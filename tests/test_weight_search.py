"""Weight-search engine: oracle parity, constraint semantics, method objectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.config import Config, PortfolioConfig, SimulationConfig
from mcport.engine import (
    METHODS,
    evaluate_portfolios,
    run_all_methods,
    run_method,
    run_simulation,
)
from mcport.ops.dirichlet import sample_constrained_weights

ATOL = 1e-9


@pytest.fixture(scope="module")
def market(rng):
    t, a = 120, 4
    rets = rng.normal(0.01, 0.06, (t, a)) @ np.diag([1.0, 1.5, 0.7, 1.2])
    mean_ann = rets.mean(0) * 12
    cov_ann = np.cov(rets, rowvar=False, ddof=1) * 12
    return rets, mean_ann, cov_ann


def np_eval(w, rets, mean_ann, cov_ann, rf, alpha=0.95):
    """Oracle for the per-portfolio metrics loop (app.py:708-717)."""
    port_ret = w @ mean_ann
    port_std = np.sqrt(w @ cov_ann @ w)
    series = rets @ w
    sharpe = (port_ret - rf) / port_std if port_std > 0 else 0.0
    v = np.percentile(series, (1 - alpha) * 100)
    tail = series[series <= v]
    c = tail.mean() if len(tail) else v
    return port_ret, port_std, sharpe, v, c


def test_evaluate_matches_oracle(market, rng):
    rets, mean_ann, cov_ann = market
    w = rng.dirichlet(np.ones(4), size=64)
    ev = evaluate_portfolios(w, rets, mean_ann, cov_ann, risk_free=0.03, cand_block=16)
    for i in range(0, 64, 7):
        r, s, sh, v, c = np_eval(w[i], rets, mean_ann, cov_ann, 0.03)
        np.testing.assert_allclose(float(ev.ret[i]), r, atol=ATOL)
        np.testing.assert_allclose(float(ev.std[i]), s, atol=ATOL)
        np.testing.assert_allclose(float(ev.sharpe[i]), sh, atol=ATOL)
        np.testing.assert_allclose(float(ev.var_95[i]), v, atol=ATOL)
        np.testing.assert_allclose(float(ev.cvar_95[i]), c, atol=ATOL)


def test_sampler_simplex_and_bounds():
    key = jax.random.key(0)
    min_w = jnp.array([0.1, 0.0, 0.0])
    max_w = jnp.array([1.0, 0.6, 0.9])
    w, valid = sample_constrained_weights(key, 512, min_w, max_w)
    w = np.asarray(w)
    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)
    assert w.min() >= 0
    vw = w[np.asarray(valid)]
    assert len(vw) > 0
    assert (vw >= np.asarray(min_w) - 1e-7).all()
    assert (vw <= np.asarray(max_w) + 1e-7).all()


def test_sampler_unconstrained_all_valid():
    w, valid = sample_constrained_weights(
        jax.random.key(1), 256, jnp.zeros(5), jnp.ones(5)
    )
    assert bool(jnp.all(valid))


def test_sampler_impossible_constraints():
    """Bounds no simplex point satisfies → every row invalid, loop terminates."""
    w, valid = sample_constrained_weights(
        jax.random.key(2), 64, jnp.full(3, 0.5), jnp.ones(3), max_retries=5
    )
    assert not bool(jnp.any(valid))


def test_method_objectives(market):
    rets, mean_ann, cov_ann = market
    key = jax.random.key(0)
    out = run_all_methods(
        key, rets, mean_ann, cov_ann,
        methods=tuple(METHODS), risk_free=0.03, n_portfolios=500, dtype=jnp.float64,
    )
    mc = out["Monte Carlo"]
    assert mc.opt_idx == int(np.argmax(mc.metric))            # argmax sharpe
    v = out["VaR"]
    assert v.opt_idx == int(np.argmin(v.metric))              # argmin stored -var
    assert v.metric[v.opt_idx] == pytest.approx(-v.eval.var_95[v.opt_idx])
    c = out["CVaR"]
    assert c.opt_idx == int(np.argmin(c.metric))
    ew = out["Equal Weight"]
    assert ew.weights.shape == (1, 4)
    np.testing.assert_allclose(ew.weights[0], 0.25)
    assert ew.opt_idx == 0
    tr = out["Target Risk"]
    if (tr.std[tr.valid] <= 0.30).any():
        assert tr.std[tr.opt_idx] <= 0.30 + 1e-9
        feas = tr.valid & (tr.std <= 0.30)
        assert tr.ret[tr.opt_idx] == pytest.approx(tr.ret[feas].max())


def test_mpt_equals_monte_carlo_with_same_key(market):
    """'Monte Carlo' and 'MPT' are numerically identical given the same draws
    (SURVEY.md §2)."""
    rets, mean_ann, cov_ann = market
    k = jax.random.key(7)
    a = run_method(k, "Monte Carlo", rets, mean_ann, cov_ann, n_portfolios=200)
    b = run_method(k, "MPT", rets, mean_ann, cov_ann, n_portfolios=200)
    np.testing.assert_array_equal(a.weights, b.weights)
    assert a.opt_idx == b.opt_idx


def test_equal_weight_violating_bounds_guarded(market):
    """The reference IndexErrors here (SURVEY.md §2); we return opt_idx == -1."""
    rets, mean_ann, cov_ann = market
    r = run_method(
        jax.random.key(0), "Equal Weight", rets, mean_ann, cov_ann,
        min_weights=jnp.array([0.5, 0.0, 0.0, 0.0]),  # EW w=0.25 violates min 0.5
    )
    assert r.n_valid == 0 and r.opt_idx == -1 and r.opt_weights is None


def test_run_simulation_end_to_end(fixtures_dir):
    from mcport.config import DataConfig
    from mcport.data import load_universe

    data = load_universe(
        paths=[
            fixtures_dir / "BTC_USD 7 Years Weekly.csv",
            fixtures_dir / "ETH_USD 7 Years Weekly.csv",
        ],
        config=DataConfig(period="W"),
    )
    cfg = Config(
        simulation=SimulationConfig(n_portfolios=1000, seed=3, dtype="float64"),
        portfolio=PortfolioConfig(risk_free=0.03),
    )
    out = run_simulation(data, cfg)
    assert set(out.results) == set(METHODS)
    for m, r in out.results.items():
        if m == "Equal Weight":
            assert r.weights.shape == (1, 2)
        else:
            assert r.weights.shape == (1000, 2)
        assert r.opt_idx >= 0
        w = r.opt_weights
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
        alloc = r.allocations(10_000.0)
        np.testing.assert_allclose(alloc.sum(), 10_000.0, rtol=1e-6)
    # moments parity with pandas path
    np.testing.assert_allclose(out.mean_ann, data.mean_ann, atol=1e-12)
    np.testing.assert_allclose(out.cov_ann, data.cov_ann, atol=1e-12)


def test_reproducible(market):
    rets, mean_ann, cov_ann = market
    a = run_method(jax.random.key(5), "Monte Carlo", rets, mean_ann, cov_ann, n_portfolios=100)
    b = run_method(jax.random.key(5), "Monte Carlo", rets, mean_ann, cov_ann, n_portfolios=100)
    np.testing.assert_array_equal(a.weights, b.weights)
    assert a.opt_idx == b.opt_idx


def test_fused_methods_bit_identical_to_sequential():
    """run_all_methods' single-dispatch path must reproduce per-method
    run_method EXACTLY (same split keys, same draws, same metrics/optima) —
    for both trivial and constrained bounds."""
    import jax

    from mcport.engine.weight_search import run_all_methods, run_method

    rng = np.random.default_rng(11)
    a = 3
    rets = rng.normal(1e-3, 0.03, (60, a))
    mean_ann = rets.mean(0) * 52
    cov_ann = np.cov(rets, rowvar=False, ddof=1) * 52
    methods = ("Monte Carlo", "VaR", "CVaR", "MPT", "Equal Weight", "Target Risk")
    for bounds in (dict(),
                   dict(min_weights=np.array([0.05, 0.0, 0.1]),
                        max_weights=np.array([0.8, 0.6, 1.0]))):
        fused = run_all_methods(jax.random.key(4), rets, mean_ann, cov_ann,
                                methods=methods, n_portfolios=400, **bounds)
        keys = jax.random.split(jax.random.key(4), len(methods))
        for m, k in zip(methods, keys):
            seq = run_method(k, m, rets, mean_ann, cov_ann, n_portfolios=400,
                             **bounds)
            f = fused[m]
            np.testing.assert_array_equal(f.weights, seq.weights)
            np.testing.assert_array_equal(f.valid, seq.valid)
            np.testing.assert_array_equal(f.metric, seq.metric)
            np.testing.assert_array_equal(f.ret, seq.ret)
            np.testing.assert_array_equal(f.std, seq.std)
            assert f.opt_idx == seq.opt_idx
