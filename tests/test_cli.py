"""CLI surface tests — every subcommand end-to-end on fixture data."""

import json
import io
import contextlib

import numpy as np
import pytest

from mcport.cli import build_parser, main


def run_cli(args) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(args)
    return json.loads(buf.getvalue())


@pytest.fixture(scope="module")
def eth(fixtures_dir):
    return str(fixtures_dir / "ETH_USD 7 Years Weekly.csv")


@pytest.fixture(scope="module")
def btc(fixtures_dir):
    return str(fixtures_dir / "BTC_USD 7 Years Weekly.csv")


def test_stats_command(btc, eth):
    out = run_cli(["stats", btc, eth, "--period", "W"])
    assert out["ann_factor"] == 52
    assert len(out["stats"]) == 2
    for stats in out["stats"].values():
        assert set(stats) >= {"sharpe", "var_95", "cvar_95", "max_drawdown"}


def test_simulate_command(btc, eth):
    out = run_cli(["simulate", btc, eth, "--period", "W", "--n-portfolios", "200",
                   "--methods", "Monte Carlo,Equal Weight"])
    mc = out["methods"]["Monte Carlo"]
    assert mc["n_valid"] == 200
    w = np.array(list(mc["weights"].values()))
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)
    alloc = np.array(list(mc["allocation_usd"].values()))
    np.testing.assert_allclose(alloc.sum(), 10_000.0, rtol=1e-5)
    assert out["methods"]["Equal Weight"]["weights"][list(mc["weights"])[0]] == 0.5


def test_gbm_risk_command_with_checkpoint(eth, tmp_path):
    ck = str(tmp_path / "ck.npz")
    out = run_cli(["gbm-risk", eth, "--period", "W", "--paths", "4096", "--steps", "8",
                   "--no-pallas", "--checkpoint", ck])
    assert out["done"] and out["n_paths"] == 4096
    assert out["cvar"] <= out["var"]
    # resume on a finished checkpoint is a no-op with identical stats
    out2 = run_cli(["gbm-risk", eth, "--period", "W", "--paths", "4096", "--steps", "8",
                    "--no-pallas", "--checkpoint", ck, "--resume"])
    assert out2["var"] == pytest.approx(out["var"], abs=1e-12)


def test_risk_parity_command(btc, eth):
    out = run_cli(["risk-parity", btc, eth, "--period", "W"])
    rc = np.array(list(out["risk_contributions"].values()))
    np.testing.assert_allclose(rc, 0.5, atol=1e-6)
    w = np.array(list(out["weights"].values()))
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-8)
    out_b = run_cli(["risk-parity", btc, eth, "--period", "W",
                     "--budgets", "3,1"])
    rc_b = np.array(list(out_b["risk_contributions"].values()))
    np.testing.assert_allclose(rc_b, [0.75, 0.25], atol=1e-6)
    out_h = run_cli(["risk-parity", btc, eth, "--period", "W", "--method", "hrp"])
    assert abs(sum(out_h["weights"].values()) - 1.0) < 1e-8


def test_cvar_frontier_command(btc, eth):
    out = run_cli(["cvar-frontier", btc, eth, "--period", "W",
                   "--scenarios", "historical", "--n-lambda", "9"])
    assert out["engine"] == "exact-rockafellar-uryasev-frontier"
    w = np.array(list(out["min_cvar"]["weights"].values()))
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-4)
    # min-CVaR point has the smallest tail loss on the frontier
    cvars = [pt["cvar"] for pt in out["frontier"]]
    assert out["min_cvar"]["cvar"] == pytest.approx(max(cvars), abs=1e-6)
    # max-return-at-budget respects feasibility when anything is feasible
    if any(c >= -0.25 for c in cvars):
        assert out["max_return_at_budget"]["cvar"] >= -0.25 - 1e-6


def test_forecast_command(eth):
    out = run_cli(["forecast", eth, "--period", "W", "--horizons", "1,2"])
    f = out["forecasts"]["ETH_USD 7 Years Weekly"]
    assert set(f) == {"1", "2"}
    lo, hi = f["1"]["conf_int"]
    assert lo < f["1"]["price"] < hi


def test_native_loader_flag(eth):
    pytest.importorskip("ctypes")
    from mcport.data.fast_loader import build_native

    if not build_native():
        pytest.skip("no C++ toolchain")
    a = run_cli(["stats", eth, "--period", "W"])
    b = run_cli(["stats", eth, "--period", "W", "--loader", "native"])
    sa = a["stats"]["ETH_USD 7 Years Weekly"]
    sb = b["stats"]["ETH_USD 7 Years Weekly"]
    for k in sa:
        assert sa[k] == pytest.approx(sb[k], rel=1e-12), k


def test_parser_rejects_unknown_method():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["nonsense"])


def test_hedged_risk_command(btc, eth, tmp_path):
    hedge = tmp_path / "hedge.json"
    hedge.write_text(json.dumps({
        "BTC_USD 7 Years Weekly": {"strategy": "Married Put",
                                   "params": {"premium_put": 0.0}},
    }))
    out = run_cli(["hedged-risk", btc, eth, "--period", "W",
                   "--hedge", str(hedge), "--models", "gbm,bootstrap",
                   "--paths", "4096", "--steps", "13"])
    for model in ("gbm", "bootstrap"):
        assert out[model]["cvar"] <= out[model]["var"]
        assert out[model]["hedged_assets"] == ["BTC_USD 7 Years Weekly"]
    # missing --hedge refuses
    with pytest.raises(SystemExit, match="requires --hedge"):
        run_cli(["hedged-risk", btc, "--period", "W"])


def test_gbm_risk_hedged_flag(btc, eth, tmp_path):
    hedge = tmp_path / "hedge.json"
    hedge.write_text(json.dumps({
        "BTC_USD 7 Years Weekly": {"strategy": "Married Put",
                                   "params": {"premium_put": 0.0}},
    }))
    base = run_cli(["gbm-risk", btc, eth, "--period", "W", "--paths", "8192",
                    "--steps", "13", "--no-pallas"])
    out = run_cli(["gbm-risk", btc, eth, "--period", "W", "--paths", "8192",
                   "--steps", "13", "--no-pallas", "--hedge", str(hedge),
                   "--path-stats"])
    assert out["hedged_assets"] == ["BTC_USD 7 Years Weekly"]
    assert out["cvar"] >= base["cvar"]          # zero-premium put floors losses
    # round 3: --path-stats now reports the hedged per-period drawdown dist
    dd = out["max_drawdown"]
    assert dd["settlement"] == "per-period hedged"
    assert -1.0 <= dd["p95_worst"] <= dd["median"] <= 0.0


def test_sim_and_dd_frontier_hedged_flag(btc, eth, tmp_path):
    hedge = tmp_path / "hedge.json"
    hedge.write_text(json.dumps({
        "ETH_USD 7 Years Weekly": {
            "legs": [["BUY_ASSET", 0, 0, 1.0], ["BUY_PUT", 1.0, 0.0, 1.0]]},
    }))
    out = run_cli(["sim-frontier", btc, eth, "--period", "W",
                   "--candidates", "512", "--paths", "1024", "--steps", "13",
                   "--hedge", str(hedge)])
    assert out["hedged"] is True and "weights" in out
    out = run_cli(["dd-frontier", btc, eth, "--period", "W",
                   "--candidates", "128", "--paths", "512", "--steps", "13",
                   "--dd-budget", "0.9", "--hedge", str(hedge)])
    assert out["hedged"] is True


def test_hedge_file_errors(btc, tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    with pytest.raises(SystemExit):
        run_cli(["gbm-risk", btc, "--period", "W", "--hedge", str(bad)])
    wrong = tmp_path / "wrong.json"
    wrong.write_text(json.dumps({"NOPE": {"strategy": "Collar"}}))
    with pytest.raises(SystemExit, match="not in the universe"):
        run_cli(["gbm-risk", btc, "--period", "W", "--hedge", str(wrong)])


def test_simulate_hedged_flag(btc, eth, tmp_path):
    """--hedge reweights the HISTORICAL series (reference tab-2 semantics,
    app.py:659-667) through legs_from_spec; metrics shift vs unhedged."""
    hedge = tmp_path / "hedge.json"
    hedge.write_text(json.dumps({
        "ETH_USD 7 Years Weekly": {"strategy": "Covered Call",
                                   "params": {"premium_call": 0.02}},
    }))
    base = run_cli(["simulate", btc, eth, "--period", "W",
                    "--n-portfolios", "200", "--methods", "Monte Carlo"])
    out = run_cli(["simulate", btc, eth, "--period", "W",
                   "--n-portfolios", "200", "--methods", "Monte Carlo",
                   "--hedge", str(hedge)])
    m0 = base["methods"]["Monte Carlo"]
    m1 = out["methods"]["Monte Carlo"]
    assert m1["n_valid"] > 0
    # the covered-call overlay changes the assembled return series
    assert m1["expected_return_ann"] != m0["expected_return_ann"]


def test_path_risk_command(btc, eth, tmp_path):
    out = run_cli(["path-risk", btc, eth, "--period", "W",
                   "--paths", "1024", "--steps", "13"])
    assert out["settlement"] == "unhedged" and out["rebalance_gbm"]
    assert out["student_t"]["t_dof"] > 2.0
    for model in ("gbm", "student_t", "garch", "dcc", "jump", "bootstrap"):
        assert out[model]["cvar"] <= out[model]["var"]
        assert -1.0 <= out[model]["dd_p95"] <= out[model]["dd_median"] <= 0.0
    # hedged: per-period option settlement across the families
    hedge = tmp_path / "hedge.json"
    hedge.write_text(json.dumps({
        "BTC_USD 7 Years Weekly": {"strategy": "Married Put",
                                   "params": {"premium_put": 0.0}},
    }))
    out_h = run_cli(["path-risk", btc, eth, "--period", "W",
                     "--hedge", str(hedge), "--models", "garch,bootstrap",
                     "--paths", "1024", "--steps", "13"])
    assert out_h["settlement"] == "per-period hedged"
    for model in ("garch", "bootstrap"):
        assert out_h[model]["hedged_assets"] == ["BTC_USD 7 Years Weekly"]
        assert out_h[model]["dd_mean"] >= out[model]["dd_mean"] - 1e-9


def test_dd_frontier_family_models(btc, eth):
    for model in ("garch", "dcc", "jump", "bootstrap"):
        out = run_cli(["dd-frontier", btc, eth, "--period", "W",
                       "--model", model, "--candidates", "64",
                       "--paths", "512", "--steps", "13",
                       "--dd-budget", "0.6"])
        assert out["model"] == model
        assert out["n_feasible"] >= 0
        if "weights" in out:
            w = np.array(list(out["weights"].values()))
            np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)


def test_gbm_risk_path_stats_student_t(eth):
    out = run_cli(["gbm-risk", eth, "--period", "W", "--paths", "4096",
                   "--steps", "8", "--no-pallas", "--innovations", "student_t",
                   "--path-stats"])
    dd = out["max_drawdown"]
    assert dd["innovations"] == "student_t"
    assert -1.0 <= dd["p95_worst"] <= dd["median"] <= 0.0


def test_path_risk_checkpoint_resume(btc, eth, tmp_path):
    ck = str(tmp_path / "pr.npz")
    args = ["path-risk", btc, eth, "--period", "W", "--models", "garch",
            "--paths", "4096", "--steps", "8", "--checkpoint", ck]
    out = run_cli(args)
    assert out["garch"]["done"]
    # resume on a finished checkpoint is a no-op with identical stats
    out2 = run_cli(args + ["--resume"])
    assert out2["garch"]["var"] == pytest.approx(out["garch"]["var"],
                                                 abs=1e-12)
    assert out2["garch"]["dd_p95"] == out["garch"]["dd_p95"]
    with pytest.raises(SystemExit, match="single --models"):
        run_cli(["path-risk", btc, "--period", "W", "--checkpoint", ck])
    with pytest.raises(SystemExit, match="requires --checkpoint"):
        run_cli(["path-risk", btc, "--period", "W", "--models", "garch",
                 "--resume"])


def test_stress_path_stats_flag(eth):
    out = run_cli(["stress", eth, "--period", "W", "--paths", "4096",
                   "--steps", "8", "--path-stats"])
    assert out["engine"] == "scenario-stress-paths"
    assert out["scenarios"]["vol_x2"]["d_dd_p95"] < 0
    assert "worst_by_dd_p95" in out


def test_backtest_dd_budget_rule(btc, eth):
    # suite diet: wide window/horizon → 2 rebalances (the dd_budget rule runs
    # a 2048x2048 frontier per rebalance; mechanics are covered by
    # test_backtest.py::test_dd_budget_rule_in_walk_forward)
    out = run_cli(["backtest", btc, eth, "--period", "W", "--window", "208",
                   "--horizon", "78", "--rules", "equal,dd_budget"])
    assert "dd_budget" in out["summary"]
    assert out["n_rebalances"] >= 2


def test_greeks_command(btc, eth, tmp_path):
    out = run_cli(["greeks", btc, eth, "--period", "W", "--paths", "4096",
                   "--steps", "8"])
    assert not out["hedged"]
    pa = out["per_asset"]
    assert len(pa) == 2
    # Euler self-diagnostics come back tiny (homogeneity holds in-float)
    assert out["euler_gap_cvar"] < 1e-4
    w = np.array([v["weight"] for v in pa.values()])
    grad = np.array([v["d_cvar_dw"] for v in pa.values()])
    assert float(w @ grad) == pytest.approx(out["cvar"], abs=1e-4)
    for v in pa.values():
        assert v["vega_cvar"] < 0          # more vol worsens the tail
        assert "delta_mean" not in v       # no hedge → no spot deltas

    hedge = tmp_path / "hedge.json"
    hedge.write_text(json.dumps({
        "BTC_USD 7 Years Weekly": {"strategy": "Married Put",
                                   "params": {"premium_put": 0.0}},
    }))
    out_h = run_cli(["greeks", btc, eth, "--period", "W", "--paths", "4096",
                     "--steps", "8", "--hedge", str(hedge)])
    assert out_h["hedged"]
    ph = out_h["per_asset"]
    assert "delta_mean" in ph["BTC_USD 7 Years Weekly"]
    # unhedged asset: spot delta is 0 up to f32 rounding
    assert abs(ph["ETH_USD 7 Years Weekly"]["delta_cvar"]) < 1e-6
    # zero-premium protective put floors the tail: CVaR improves
    assert out_h["cvar"] >= out["cvar"]

    out_g = run_cli(["greeks", btc, eth, "--period", "W", "--paths", "8192",
                     "--steps", "8", "--hedge", str(hedge), "--gamma"])
    gb = out_g["per_asset"]["BTC_USD 7 Years Weekly"]
    assert np.isfinite(gb["gamma_mean"]) and gb["gamma_se"] >= 0
    # unhedged asset's gamma is structurally ~0
    assert abs(out_g["per_asset"]["ETH_USD 7 Years Weekly"]["gamma_mean"]) < 1e-8

    with pytest.raises(SystemExit, match="requires --hedge"):
        run_cli(["greeks", btc, "--period", "W", "--paths", "1024",
                 "--steps", "4", "--gamma"])


def test_estimator_tier_flags(btc, eth):
    base = run_cli(["gbm-risk", btc, eth, "--period", "W", "--paths", "4096",
                    "--steps", "8", "--no-pallas"])
    lw = run_cli(["gbm-risk", btc, eth, "--period", "W", "--paths", "4096",
                  "--steps", "8", "--no-pallas", "--estimator", "lw"])
    ew = run_cli(["gbm-risk", btc, eth, "--period", "W", "--paths", "4096",
                  "--steps", "8", "--no-pallas", "--estimator", "ewma",
                  "--ewma-lambda", "0.9"])
    # same draws, different covariance tier -> different (finite) tails
    assert lw["var"] != base["var"] and ew["var"] != base["var"]
    for out in (base, lw, ew):
        assert -1.0 <= out["cvar"] <= out["var"] <= 0.5


def test_greeks_family_schema_matches_gbm_schema(btc, eth):
    gbm = run_cli(["greeks", btc, eth, "--period", "W", "--paths", "4096",
                   "--steps", "8"])
    fam = run_cli(["greeks", btc, eth, "--period", "W", "--paths", "4096",
                   "--steps", "8", "--model", "bootstrap"])
    # one consumer contract: same top-level keys, same per_asset core keys
    assert set(fam) == set(gbm)
    for v in fam["per_asset"].values():
        assert {"weight", "d_mean_dw", "d_var_dw", "d_cvar_dw"} <= set(v)
        assert "d_cvar_dmu" not in v       # family tier: no param gradients
    assert fam["model"] == "bootstrap" and gbm["model"] == "gbm"
    # GBM-path-only flags are rejected loudly, not silently dropped
    for bad in (["--qmc", "sobol"], ["--antithetic"], ["--estimator", "lw"],
                ["--innovations", "student_t"]):
        with pytest.raises(SystemExit, match="gbm only"):
            run_cli(["greeks", btc, "--period", "W", "--paths", "1024",
                     "--steps", "4", "--model", "garch", *bad])


def test_ci_flags_emit_tail_error_bars(eth):
    base = run_cli(["gbm-risk", eth, "--period", "W", "--paths", "4096",
                    "--steps", "8", "--no-pallas"])
    assert "tail_ci" not in base                 # opt-in post-processing
    out = run_cli(["gbm-risk", eth, "--period", "W", "--paths", "4096",
                   "--steps", "8", "--no-pallas", "--ci"])
    ci = out["tail_ci"]
    assert ci["var_lo"] <= out["var"] <= ci["var_hi"]
    assert ci["cvar_lo"] <= out["cvar"] <= ci["cvar_hi"]
    assert ci["var_se"] > 0
    # identical point estimates: CI never perturbs the draw streams
    assert out["var"] == base["var"] and out["cvar"] == base["cvar"]

    pr = run_cli(["path-risk", eth, "--period", "W", "--paths", "4096",
                  "--steps", "8", "--models", "garch", "--ci", "100"])
    ci = pr["garch"]["tail_ci"]
    assert ci["dd_p95_lo"] <= pr["garch"]["dd_p95"] <= ci["dd_p95_hi"]


def test_hedged_risk_ci_flag(eth, tmp_path):
    hedge = tmp_path / "hedge.json"
    hedge.write_text(json.dumps({
        "ETH_USD 7 Years Weekly": {"strategy": "Covered Call",
                                   "params": {"premium_call": 5.0}}}))
    out = run_cli(["hedged-risk", eth, "--period", "W", "--paths", "4096",
                   "--steps", "8", "--hedge", str(hedge), "--models", "gbm",
                   "--ci", "100"])
    ci = out["gbm"]["tail_ci"]
    assert ci["var_lo"] <= out["gbm"]["var"] <= ci["var_hi"]
    assert ci["cvar_se"] > 0


def test_stats_ci_flag(eth):
    base = run_cli(["stats", eth, "--period", "W"])
    out = run_cli(["stats", eth, "--period", "W", "--ci", "200"])
    row = out["stats"]["ETH_USD 7 Years Weekly"]
    ci = row["ci"]
    for k in ("sharpe", "var_95", "cvar_95", "max_drawdown"):
        assert ci[k]["lo"] <= ci[k]["hi"] and ci[k]["se"] > 0
    # point estimates untouched by the error bars
    for k, v in base["stats"]["ETH_USD 7 Years Weekly"].items():
        assert row[k] == v


def test_american_command(btc, eth):
    out = run_cli(["american", btc, eth, "--period", "W", "--kind", "put",
                   "--strike-rel", "0.95", "--paths", "4096", "--steps", "13"])
    assert out["kind"] == "put"
    assert len(out["per_asset"]) == 2
    for row in out["per_asset"].values():
        assert row["strike"] == pytest.approx(0.95 * row["spot"], rel=1e-6)
        assert 0.0 < row["american"] < row["strike"]
        assert row["se"] > 0.0
        # American ≥ European up to MC error; boundary below strike (put)
        assert row["american"] >= row["european"] - 4.0 * row["se"]
        assert row["boundary_last"] < row["strike"]


def test_american_greeks_flag(btc, eth):
    out = run_cli(["american", btc, eth, "--period", "W", "--kind", "put",
                   "--strike-rel", "0.95", "--paths", "4096", "--steps", "13",
                   "--greeks"])
    for row in out["per_asset"].values():
        assert -1.0 <= row["delta"] <= 0.0          # put delta
        assert row["vega_step"] > 0.0


def test_american_settlement_mode(btc, eth, tmp_path):
    import json as _json

    hedge = tmp_path / "hedge.json"
    hedge.write_text(_json.dumps(
        {"BTC_USD 7 Years Weekly": {"strategy": "Married Put"}}))
    out = run_cli(["american", btc, eth, "--period", "W", "--paths", "4096",
                   "--steps", "13", "--hedge", str(hedge)])
    assert set(out["american"]) == {"mean", "var", "cvar"}
    assert out["american"]["cvar"] <= out["american"]["var"]
    f = out["exercise_frequency"]
    assert f["ETH_USD 7 Years Weekly"] == 0.0      # unhedged: never differs
    assert 0.0 <= f["BTC_USD 7 Years Weekly"] <= 1.0
