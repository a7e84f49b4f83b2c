"""Walk-forward OOS backtest engine (engine.backtest)."""

import numpy as np
import pytest

from mcport.engine.backtest import BUILTIN_RULES, BacktestResult, make_rules, walk_forward


def _returns(t=260, a=4, seed=0):
    rng = np.random.default_rng(seed)
    vol = np.linspace(0.005, 0.05, a)
    mu = np.linspace(0.0005, 0.0015, a)
    return mu + vol * rng.standard_normal((t, a))


def test_protocol_no_lookahead_and_exact_series():
    """The OOS series must be exactly hold-block @ fit-window weights — and a
    rule only ever sees data strictly before its rebalance date."""
    r = _returns()
    seen = []

    def spy(fit):
        seen.append(fit.copy())
        return np.array([1.0, 0.0, 0.0, 0.0])

    res = walk_forward(r, window=52, horizon=13, rules={"spy": spy})
    # rebalance grid
    np.testing.assert_array_equal(res.rebal_idx,
                                  np.arange(52, r.shape[0] - 13 + 1, 13))
    assert len(seen) == len(res.rebal_idx)
    for k, t0 in enumerate(res.rebal_idx):
        np.testing.assert_array_equal(seen[k], r[t0 - 52:t0])
        np.testing.assert_allclose(
            res.oos_returns[0, k * 13:(k + 1) * 13], r[t0:t0 + 13, 0])
    # summary total return = compounded OOS
    want = float(np.prod(1.0 + res.oos_returns[0]) - 1.0)
    assert abs(res.summary["spy"]["total_return"] - want) < 1e-12


def test_builtin_rules_run_and_score():
    r = _returns(t=200, a=3, seed=1)
    res = walk_forward(r, window=60, horizon=20,
                       rules=("equal", "inverse_vol", "min_var", "hrp", "erc"),
                       ann_factor=52)
    assert set(res.rule_names) == {"equal", "inverse_vol", "min_var", "hrp", "erc"}
    # weights on the simplex at every rebalance
    np.testing.assert_allclose(res.weights.sum(axis=2), 1.0, atol=1e-8)
    assert (res.weights >= -1e-12).all()
    # equal weight never turns over
    i = res.rule_names.index("equal")
    assert res.summary["equal"]["avg_turnover"] == 0.0
    # min-var should realize lower OOS vol than equal weight on this design
    # (asset vols differ 10x and the window sees it)
    assert res.summary["min_var"]["ann_vol"] < res.summary["equal"]["ann_vol"]
    # scorecard coherence
    for name in res.rule_names:
        s = res.summary[name]
        assert s["cvar"] <= s["var"] <= 0.1
        assert -1.0 <= s["max_drawdown"] <= 0.0


def test_exact_tail_rules_compose():
    r = _returns(t=150, a=3, seed=2)
    res = walk_forward(r, window=50, horizon=50, rules=("min_cvar", "min_cdar"),
                       alpha=0.9)
    assert np.isfinite(res.oos_returns).all()
    np.testing.assert_allclose(res.weights.sum(axis=2), 1.0, atol=1e-5)


def test_oos_curve_and_guards():
    r = _returns(t=120, a=2, seed=3)
    res = walk_forward(r, window=40, horizon=40, rules=("equal",))
    curve = res.oos_curve("equal")
    assert curve.shape == (res.oos_returns.shape[1],)
    np.testing.assert_allclose(curve[-1], 1.0 + res.summary["equal"]["total_return"],
                               rtol=1e-12)
    with pytest.raises(ValueError):
        walk_forward(r, window=200, horizon=40, rules=("equal",))
    with pytest.raises(ValueError):
        make_rules(("nope",))
    with pytest.raises(ValueError):
        walk_forward(r, window=40, horizon=40,
                     rules={"bad": lambda fit: np.array([np.nan, 1.0])})


def test_full_builtin_set_smoke():
    r = _returns(t=140, a=3, seed=4)
    res = walk_forward(r, window=60, horizon=40)
    # dd_budget is opt-in by name (a simulated frontier per rebalance date);
    # the default set is every other builtin
    assert set(res.rule_names) == set(BUILTIN_RULES) - {"dd_budget"}


def test_switch_costs_charged_correctly():
    """cost_bps reduces the first return of each post-initial block by
    half-L1 turnover x rate; zero-cost series differs by exactly that."""
    r = _returns(t=120, a=3, seed=5)

    def make_flip():
        calls = [0]

        def flip(fit):
            calls[0] += 1
            return (np.array([1.0, 0, 0]) if calls[0] % 2
                    else np.array([0, 1.0, 0]))
        return flip

    free = walk_forward(r, window=40, horizon=20, rules={"flip": make_flip()})
    paid = walk_forward(r, window=40, horizon=20, rules={"flip": make_flip()},
                        cost_bps=25.0)
    diff = free.oos_returns[0] - paid.oos_returns[0]
    assert len(free.rebal_idx) >= 3
    for k in range(1, len(free.rebal_idx)):
        traded = 0.5 * np.abs(free.weights[0, k] - free.weights[0, k - 1]).sum()
        assert traded == 1.0             # full switch every rebalance
        np.testing.assert_allclose(diff[k * 20], 25e-4 * traded, atol=1e-12)
        np.testing.assert_allclose(diff[k * 20 + 1:(k + 1) * 20], 0.0, atol=1e-12)
    assert diff[:20].max() == 0.0        # no charge on the initial allocation
    # equal weight pays nothing
    eq_free = walk_forward(r, window=40, horizon=20, rules=("equal",))
    eq_paid = walk_forward(r, window=40, horizon=20, rules=("equal",), cost_bps=25.0)
    np.testing.assert_array_equal(eq_free.oos_returns, eq_paid.oos_returns)


def test_probabilistic_sharpe_properties():
    """PSR: 0.5 at zero edge, increases with sample length, hurt by fat
    tails/negative skew at the same point Sharpe (Bailey-Lopez de Prado)."""
    from scipy.stats import norm as _norm

    from mcport.engine.backtest import probabilistic_sharpe

    rng = np.random.default_rng(0)
    # known-formula check on a clean normal sample
    r = rng.standard_normal(500) * 0.02 + 0.004
    sd = r.std(ddof=1)
    sr = r.mean() / sd
    z = (r - r.mean()) / sd
    want = _norm.cdf(sr * np.sqrt(499) / np.sqrt(
        1 - np.mean(z**3) * sr + (np.mean(z**4) - 1) / 4 * sr**2))
    np.testing.assert_allclose(probabilistic_sharpe(r), want, rtol=1e-12)

    # zero-mean series => ~0.5; longer sample at same SR => higher PSR
    r0 = rng.standard_normal(2000) * 0.02
    assert abs(probabilistic_sharpe(r0 - r0.mean()) - 0.5) < 1e-9
    base = rng.standard_normal(4000) * 0.02 + 0.002
    assert probabilistic_sharpe(base) > probabilistic_sharpe(base[:200])

    # appears in the walk-forward scorecard
    rmat = _returns(t=120, a=2, seed=7)
    res = walk_forward(rmat, window=40, horizon=40, rules=("equal",))
    assert 0.0 <= res.summary["equal"]["prob_sharpe"] <= 1.0


# ---- simulated drawdown-budget rule (late round 3) --------------------------


def test_dd_budget_rule_in_walk_forward():
    from mcport.engine.backtest import BUILTIN_RULES, walk_forward

    assert "dd_budget" in BUILTIN_RULES
    rng = np.random.default_rng(23)
    rets = rng.normal(2e-3, 0.03, (120, 3))
    res = walk_forward(rets, window=52, horizon=13,
                       rules=("equal", "dd_budget"), ann_factor=52)
    assert "dd_budget" in res.summary
    w = res.weights[res.rule_names.index("dd_budget")]
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
    assert np.isfinite(res.summary["dd_budget"]["sharpe"])
    # an impossible budget falls back to equal weight (rule-level guard)
    from mcport.engine.backtest import _rule_dd_budget

    w_eq = _rule_dd_budget(rets[:52], dd_budget=1e-6, n_steps=13)
    np.testing.assert_allclose(w_eq, np.full(3, 1 / 3))


def test_estimator_tier_threads_into_cov_rules():
    """walk_forward(estimator=) must change the weights of every
    covariance-consuming rule (min_var/max_sharpe/erc/hrp) while leaving
    covariance-free rules (equal, min_cvar — scenario-based) untouched."""
    rng = np.random.default_rng(11)
    t, a = 140, 4
    cov = 0.02**2 * (0.5 * np.eye(a) + 0.5)
    r = rng.multivariate_normal(np.full(a, 1e-3), cov, size=t)
    kw = dict(window=60, horizon=40, ann_factor=52)
    base = walk_forward(r, rules=("min_var", "erc", "equal", "min_cvar"), **kw)
    lw = walk_forward(r, rules=("min_var", "erc", "equal", "min_cvar"),
                      estimator="lw", **kw)
    names = base.rule_names
    i = {n: k for k, n in enumerate(names)}
    assert not np.allclose(base.weights[i["min_var"]], lw.weights[i["min_var"]])
    assert not np.allclose(base.weights[i["erc"]], lw.weights[i["erc"]])
    np.testing.assert_array_equal(base.weights[i["equal"]],
                                  lw.weights[i["equal"]])
    np.testing.assert_allclose(base.weights[i["min_cvar"]],
                               lw.weights[i["min_cvar"]])
    ew = walk_forward(r, rules=("min_var",), estimator="ewma",
                      ewma_lambda=0.9, **kw)
    assert not np.allclose(base.weights[i["min_var"]], ew.weights[0])
