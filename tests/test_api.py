"""Top-level API: the full workflow through one module, engine dispatch included."""

import numpy as np
import pytest

from mcport.api import (Config, compare_tail_risk, compute_stats, forecast,
                        gbm_risk, load_universe, simulate)
from mcport.config import DataConfig, GBMConfig, SimulationConfig
from mcport.parallel import make_mesh


@pytest.fixture(scope="module")
def data(fixtures_dir):
    return load_universe(
        paths=[
            fixtures_dir / "BTC_USD 7 Years Weekly.csv",
            fixtures_dir / "ETH_USD 7 Years Weekly.csv",
        ],
        config=DataConfig(period="W"),
    )


def test_full_workflow(data):
    cfg = Config(simulation=SimulationConfig(n_portfolios=200),
                 gbm=GBMConfig(n_paths=4096, n_steps=8, path_block=1024, use_pallas=False))
    stats = compute_stats(data, cfg)
    assert set(stats) == set(data.names)
    sim = simulate(data, cfg, methods=("Monte Carlo",))
    assert sim.results["Monte Carlo"].opt_idx >= 0
    risk = gbm_risk(data, [0.5, 0.5], cfg)
    assert risk.cvar <= risk.var and risk.n_paths == 4096
    fc = forecast(data, cfg)
    assert set(fc) == set(data.names)


def test_gbm_risk_qmc_dispatch(data):
    cfg = Config(gbm=GBMConfig(n_paths=4096, n_steps=8, qmc="sobol", use_pallas=False))
    r_qmc = gbm_risk(data, [0.5, 0.5], cfg)
    cfg_mc = Config(gbm=GBMConfig(n_paths=4096, n_steps=8, path_block=1024, use_pallas=False))
    r_mc = gbm_risk(data, [0.5, 0.5], cfg_mc)
    # same law: moments agree within MC error; QMC estimator is valid
    np.testing.assert_allclose(r_qmc.mean, r_mc.mean, atol=0.05)
    assert abs(r_qmc.port_mean - r_mc.port_mean) < 0.1
    assert r_qmc.cvar <= r_qmc.var


def test_gbm_risk_sharded_dispatch(data, eight_devices):
    mesh = make_mesh(eight_devices)
    cfg = Config(gbm=GBMConfig(n_paths=8192, n_steps=8, use_pallas=False))
    r = gbm_risk(data, [0.5, 0.5], cfg, mesh=mesh)
    assert r.n_paths == 8192
    assert r.cvar <= r.var
    assert np.isfinite(r.cov).all()


def test_gbm_risk_rejects_bad_weights(data):
    with pytest.raises(ValueError, match="weights"):
        gbm_risk(data, [1.0], Config())


def test_gbm_risk_mesh_checkpoint_composition(tmp_path):
    """mesh + checkpoint_path routes to the sharded resumable engine, whose
    block streams equal the single-chip engine's → identical VaR."""
    import jax

    from mcport.models.gbm import GBMParams

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params = GBMParams(s0=np.ones(2), mean_step=np.array([0.002, 0.001]),
                       chol_step=np.diag([0.03, 0.02]))
    cfg = Config(gbm=GBMConfig(n_paths=8_192, n_steps=8, path_block=1_024,
                               use_pallas=False))
    single = gbm_risk(params, [0.5, 0.5], cfg)
    sharded = gbm_risk(params, [0.5, 0.5], cfg, mesh=make_mesh(),
                       checkpoint_path=tmp_path / "ck.npz")
    assert sharded.var == single.var and sharded.cvar == single.cvar


def test_compare_tail_risk_all_models(data):
    """All seven model families produce coherent tail estimates on one universe."""
    cfg = Config(gbm=GBMConfig(n_paths=16_384, n_steps=8, path_block=4_096,
                               use_pallas=False))
    out = compare_tail_risk(data, config=cfg)
    assert set(out) == {"gbm_normal", "gbm_student_t", "ccc_garch",
                        "dcc_garch", "merton_jump", "heston",
                        "block_bootstrap"}
    for name, m in out.items():
        assert "error" not in m, (name, m)
        assert m["cvar"] <= m["var"] < m["portfolio_mean"], name
        assert -1.0 < m["cvar"] < 0.0, name
    assert out["gbm_student_t"]["t_dof"] > 4.0
    assert out["merton_jump"]["jump_rate_per_step"] >= 0.0
    assert out["heston"]["mean_xi"] >= 0.0


def test_sensitivities_api(data):
    from mcport.api import sensitivities

    cfg = Config(gbm=GBMConfig(n_paths=4096, n_steps=8, seed=2))
    out = sensitivities(data, config=cfg)
    assert not out["hedged"]
    w = np.full(2, 0.5)
    grad = np.array(list(out["d_cvar_dw"].values()))
    # Euler homogeneity: w·∇_w CVaR == CVaR in-float
    assert float(w @ grad) == pytest.approx(out["cvar"], abs=1e-4)
    assert all(v < 0 for v in out["vega_cvar"].values())

    hedged = sensitivities(
        data, config=cfg,
        legs_by_asset={data.names[0]: [("BUY_ASSET", 0, 0, 1.0),
                                       ("BUY_PUT", 1.0, 0.0, 1.0)]})
    assert hedged["hedged"] and data.names[0] in hedged["delta_mean"]
    assert abs(hedged["delta_cvar"][data.names[1]]) < 1e-6


def test_sensitivities_family_tier(data):
    from mcport.api import sensitivities

    cfg = Config(gbm=GBMConfig(n_paths=4096, n_steps=8, seed=2))
    w = np.full(2, 0.5)
    for model in ("garch", "jump", "bootstrap"):
        out = sensitivities(data, w, config=cfg, model=model)
        assert out["model"] == model
        grad = np.array(list(out["d_cvar_dw"].values()))
        # Euler homogeneity holds under every terminal law
        assert float(w @ grad) == pytest.approx(out["cvar"], abs=1e-4)
        assert out["euler_gap_cvar"] < 1e-4
        assert "d_cvar_dmu" not in out    # param tier is GBM-exact only

    hedged = sensitivities(
        data, w, config=cfg, model="jump",
        legs_by_asset={data.names[0]: [("BUY_ASSET", 0, 0, 1.0),
                                       ("BUY_PUT", 1.0, 0.0, 1.0)]})
    assert hedged["hedged"] and data.names[0] in hedged["delta_mean"]
    assert abs(hedged["delta_cvar"][data.names[1]]) < 1e-6

    with pytest.raises(ValueError, match="legs_by_asset"):
        sensitivities(data, w, config=cfg, gamma=True)  # gamma needs a hedge
    with pytest.raises(ValueError, match="gbm"):
        sensitivities(data, w, config=cfg, model="garch", gamma=True,
                      legs_by_asset={data.names[0]: [("BUY_PUT", 1.0, 0.0,
                                                      1.0)]})


def test_american_api(data):
    from mcport.api import american_settled_tail_risk, american_values

    cfg = Config(gbm=GBMConfig(n_paths=4096, n_steps=13, seed=0))
    vals = american_values(data, cfg, strike_rel=0.95)
    assert set(vals) == set(data.names)
    for row in vals.values():
        assert row["american"] >= row["european"] - 4.0 * row["se"]
        assert row["se"] > 0.0

    gvals = american_values(data, cfg, strike_rel=0.95, greeks=True)
    for row in gvals.values():
        assert -1.0 <= row["delta"] <= 0.0
        assert row["vega_step"] > 0.0

    legs = {data.names[0]: [("BUY_ASSET", 0.0, 0.0, 1.0),
                            ("BUY_PUT", 0.9 * float(data.prices[-1][0]),
                             0.0, 1.0)]}
    out = american_settled_tail_risk(data, None, cfg, legs_by_asset=legs)
    assert out["hedged_assets"] == [data.names[0]]
    assert out["exercise_frequency"][data.names[1]] == 0.0
    assert out["american"]["cvar"] <= out["american"]["var"]
