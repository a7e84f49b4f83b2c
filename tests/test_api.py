"""Top-level API: the full workflow through one module, engine dispatch included."""

import numpy as np
import pytest

from mcport.api import Config, compute_stats, forecast, gbm_risk, load_universe, simulate
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
