"""Historical-stat error bars (mcport/stats/ci.py): stationary block
bootstrap of the reference's own headline numbers."""

import numpy as np
import pytest

from mcport.stats.ci import historical_stat_cis, stationary_bootstrap_indices


def test_index_matrix_properties():
    rng = np.random.default_rng(0)
    idx = stationary_bootstrap_indices(rng, t=100, n_boot=64, p_restart=0.2)
    assert idx.shape == (64, 100)
    assert idx.min() >= 0 and idx.max() < 100
    # continuation runs exist (blocks), and restarts exist
    diffs = (idx[:, 1:] - idx[:, :-1]) % 100
    cont = (diffs == 1).mean()
    assert 0.5 < cont < 0.95        # ~1 - p_restart
    with pytest.raises(ValueError, match="p_restart"):
        stationary_bootstrap_indices(rng, 10, 2, 0.0)


def test_iid_bootstrap_matches_asymptotic_sharpe_and_var_se():
    """p_restart=1.0 (iid) on an iid normal series: the bootstrap se of the
    annualized Sharpe matches sqrt(ann·(1+sr_p²/2)/T) and the VaR se the
    order-statistic formula, both within bootstrap/MC slack."""
    from scipy.stats import norm

    rng = np.random.default_rng(3)
    t, ann = 2000, 52
    mu_p, sd_p = 0.004, 0.05
    r = rng.normal(mu_p, sd_p, t)
    ci = historical_stat_cis(r, risk_free=0.0, ann_factor=ann, n_boot=600,
                             seed=1, p_restart=1.0)
    sr_p = r.mean() / r.std(ddof=1)
    se_sharpe = np.sqrt(ann * (1 + sr_p**2 / 2) / t)
    np.testing.assert_allclose(ci["sharpe"]["se"], se_sharpe, rtol=0.25)
    se_var = np.sqrt(0.05 * 0.95 / t) / (norm.pdf(norm.ppf(0.05)) / sd_p)
    np.testing.assert_allclose(ci["var_95"]["se"], se_var, rtol=0.35)
    # intervals bracket the truth for this draw
    true_var = mu_p + sd_p * norm.ppf(0.05)
    assert ci["var_95"]["lo"] - 3 * ci["var_95"]["se"] <= true_var
    assert true_var <= ci["var_95"]["hi"] + 3 * ci["var_95"]["se"]
    for k in ("sharpe", "total_return_ann", "var_95", "cvar_95",
              "max_drawdown"):
        assert ci[k]["lo"] <= ci[k]["hi"] and ci[k]["se"] >= 0


def test_block_bootstrap_widens_error_under_volatility_clustering():
    """On a GARCH-like series the block bootstrap must report LARGER
    variance-statistic error than the iid bootstrap (serial dependence
    reduces the effective sample size — the reason blocks are the default)."""
    rng = np.random.default_rng(7)
    t = 1500
    sigma2 = np.empty(t)
    r = np.empty(t)
    s2 = 0.0025
    for i in range(t):            # omega/alpha/beta = strong clustering
        s2 = 2.5e-4 + 0.25 * (r[i - 1] ** 2 if i else s2) + 0.65 * s2
        sigma2[i] = s2
        r[i] = np.sqrt(s2) * rng.standard_normal()
    iid = historical_stat_cis(r, ann_factor=52, n_boot=400, seed=2,
                              p_restart=1.0)
    blk = historical_stat_cis(r, ann_factor=52, n_boot=400, seed=2,
                              p_restart=0.05)
    # measured on this config: block/iid se ratio ~1.6 (var) / ~1.8 (cvar).
    # (max drawdown came out ~equal — the DD statistic's error is dominated
    # by the largest shocks, which iid resampling replays just as often.)
    assert blk["cvar_95"]["se"] > 1.1 * iid["cvar_95"]["se"]
    assert blk["var_95"]["se"] > 1.1 * iid["var_95"]["se"]


def test_short_series_guard_and_determinism():
    with pytest.raises(ValueError, match="at least 8"):
        historical_stat_cis(np.zeros(4))
    rng = np.random.default_rng(0)
    r = rng.normal(0, 0.03, 60)
    a = historical_stat_cis(r, n_boot=100, seed=9)
    b = historical_stat_cis(r, n_boot=100, seed=9)
    assert a == b
