"""Golden-value tests: mcport.stats vs the reference's NumPy formulas.

The NumPy "oracle" functions below re-state the exact formulas of app.py:231-335
(per SURVEY.md §4, the reference has no tests; we lift its numerics as the gold
standard). Assertions are at 1e-9 in float64 — stricter than the 1e-6 bar.
"""

import numpy as np
import pytest

from mcport.stats import (
    STAT_COLUMNS,
    annual_return,
    annual_volatility,
    asset_stats,
    asset_stats_batch,
    cvar,
    max_drawdown,
    sharpe_ratio,
    sortino_ratio,
    var,
)

ATOL = 1e-9
# XLA CPU lowers f64 exp/pow with only f32 accuracy in this environment (measured:
# exp(1.0) off by 6e-8), so the single pow-based stat (annual_return) gets the
# BASELINE.json 1e-6 parity bar instead of 1e-9. All non-transcendental stats hold 1e-9.
POW_ATOL = 1e-6


# ---- NumPy oracles (formulas from app.py:231-263, restated) -----------------
def np_sharpe(returns, risk_free=0.0, ann=12):
    ex = returns - risk_free / ann
    std = np.std(ex, ddof=1)
    if std == 0:
        return 0.0
    return (np.mean(ex) / std) * np.sqrt(ann)


def np_sortino(returns, risk_free=0.0, ann=12):
    ex = returns - risk_free / ann
    neg = ex[ex < 0]
    dstd = np.std(neg, ddof=1) if len(neg) > 0 else 0.0001
    return (np.mean(ex) / dstd) * np.sqrt(ann)


def np_annual_vol(returns, ann=12):
    return np.std(returns, ddof=1) * np.sqrt(ann)


def np_annual_return(returns, ann=12):
    return np.prod(1 + returns) ** (ann / len(returns)) - 1


def np_max_drawdown(returns):
    c = np.cumprod(1 + returns)
    peak = np.maximum.accumulate(c)
    return np.min((c - peak) / peak)


def np_var(returns, alpha=0.95):
    return np.percentile(returns, (1 - alpha) * 100)


def np_cvar(returns, alpha=0.95):
    v = np_var(returns, alpha)
    tail = returns[returns <= v]
    return tail.mean() if len(tail) else v


@pytest.fixture(scope="module")
def series(rng):
    return rng.normal(0.01, 0.05, size=120)


def test_sharpe(series):
    np.testing.assert_allclose(
        float(sharpe_ratio(series, 0.03, 12)), np_sharpe(series, 0.03, 12), atol=ATOL
    )


def test_sharpe_zero_std():
    flat = np.full(24, 0.01)
    assert float(sharpe_ratio(flat, 0.0, 12)) == 0.0


def test_sortino(series):
    np.testing.assert_allclose(
        float(sortino_ratio(series, 0.03, 12)), np_sortino(series, 0.03, 12), atol=ATOL
    )


def test_sortino_no_negatives():
    pos = np.abs(np.random.default_rng(0).normal(0.05, 0.01, 36)) + 0.01
    # no negative excess returns → the 0.0001 floor kicks in (app.py:242)
    np.testing.assert_allclose(
        float(sortino_ratio(pos, 0.0, 12)), np_sortino(pos, 0.0, 12), atol=ATOL
    )


def test_annual_vol_and_return(series):
    np.testing.assert_allclose(float(annual_volatility(series, 52)), np_annual_vol(series, 52), atol=ATOL)
    np.testing.assert_allclose(
        float(annual_return(series, 52)), np_annual_return(series, 52), rtol=0, atol=POW_ATOL
    )


def test_max_drawdown(series):
    np.testing.assert_allclose(float(max_drawdown(series)), np_max_drawdown(series), atol=ATOL)


@pytest.mark.parametrize("alpha", [0.95, 0.99])
def test_var_cvar(series, alpha):
    np.testing.assert_allclose(float(var(series, alpha)), np_var(series, alpha), atol=ATOL)
    np.testing.assert_allclose(float(cvar(series, alpha)), np_cvar(series, alpha), atol=ATOL)


def test_cvar_leq_var(series):
    assert float(cvar(series)) <= float(var(series)) + ATOL


def test_asset_stats_table(series):
    """Full 16-stat table matches the oracle (app.py:300-335)."""
    ann, rf = 12, 0.03
    got = asset_stats(series, ann, rf)
    std_p = np.std(series, ddof=1)
    want = {
        "sharpe": np_sharpe(series, rf, ann),
        "sortino": np_sortino(series, rf, ann),
        "volatility_ann": np_annual_vol(series, ann),
        "total_return_ann": np_annual_return(series, ann),
        "implied_vol": std_p * np.sqrt(ann),
        "mean_ann": series.mean() * ann,
        "mean_month": series.mean(),
        "std_ann": std_p * np.sqrt(ann),
        "std_month": std_p,
        "min_ann": series.min() * ann,
        "max_ann": series.max() * ann,
        "min_month": series.min(),
        "max_month": series.max(),
        "max_drawdown": np_max_drawdown(series),
        "var_95": np_var(series),
        "cvar_95": np_cvar(series),
    }
    assert set(got) == set(want) == set(STAT_COLUMNS)
    for k in want:
        tol = POW_ATOL if k == "total_return_ann" else ATOL
        np.testing.assert_allclose(float(got[k]), want[k], rtol=0, atol=tol, err_msg=k)


def test_asset_stats_batch_matches_loop(rng):
    mat = rng.normal(0.01, 0.08, size=(5, 60))
    batch = asset_stats_batch(mat, 52, 0.02)
    for i in range(5):
        single = asset_stats(mat[i], 52, 0.02)
        for k in STAT_COLUMNS:
            np.testing.assert_allclose(
                float(batch[k][i]), float(single[k]), rtol=0, atol=POW_ATOL, err_msg=f"{k}[{i}]"
            )


def test_annual_return_negative_compound_parity():
    """returns < -100% make prod(1+r) negative. Both numpy and jnp give a finite
    value when ann/n is integral and NaN when fractional — bug-for-bug parity
    with the reference's formula (app.py:249), documented."""
    r_int = np.array([0.5, -1.5, 0.2, 0.1])        # exponent 12/4 = 3
    np.testing.assert_allclose(
        float(annual_return(r_int, 12)), np_annual_return(r_int, 12), atol=POW_ATOL
    )
    r_frac = np.array([0.5, -1.5, 0.2, 0.1, 0.0])  # exponent 12/5 = 2.4
    assert np.isnan(np_annual_return(r_frac, 12))
    assert np.isnan(float(annual_return(r_frac, 12)))
