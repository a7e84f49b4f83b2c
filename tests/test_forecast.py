"""Forecaster tests: parameter recovery on synthetic data, forecast semantics, fallback."""

import numpy as np
import pytest

from mcport.config import ForecastConfig
from mcport.models.arima import fit_arima_111, forecast_arima
from mcport.models.forecast import forecast_prices
from mcport.models.garch import fit_garch_11, forecast_garch_variance


def simulate_arma11(n, phi, theta, sigma, rng):
    eps = rng.normal(0, sigma, n + 1)
    y = np.zeros(n)
    y[0] = eps[1]
    for t in range(1, n):
        y[t] = phi * y[t - 1] + eps[t + 1] + theta * eps[t]
    return y


def simulate_garch11(n, mu, omega, alpha, beta, rng):
    r = np.zeros(n)
    s2 = omega / (1 - alpha - beta)
    eps_prev = 0.0
    for t in range(n):
        s2 = omega + alpha * eps_prev**2 + beta * s2
        eps_prev = rng.normal(0, np.sqrt(s2))
        r[t] = mu + eps_prev
    return r


def test_arima_recovers_parameters(rng):
    phi, theta = 0.6, -0.3
    y = simulate_arma11(4000, phi, theta, 0.02, rng)
    x = np.concatenate([[0.0], np.cumsum(y)])  # integrate so diff(x) == y
    fit = fit_arima_111(x)
    assert abs(fit.phi - phi) < 0.08
    assert abs(fit.theta - theta) < 0.10
    assert abs(fit.sigma2 - 0.02**2) / 0.02**2 < 0.15


def test_arima_forecast_recursion():
    from mcport.models.arima import Arima111Fit

    fit = Arima111Fit(phi=0.5, theta=0.2, sigma2=1.0, last_y=0.1, last_eps=0.04,
                      last_level=2.0)
    f = forecast_arima(fit, 3)
    dy1 = 0.5 * 0.1 + 0.2 * 0.04
    dy2 = 0.5 * dy1
    dy3 = 0.5 * dy2
    np.testing.assert_allclose(f, 2.0 + np.cumsum([dy1, dy2, dy3]), atol=1e-12)


def test_garch_recovers_parameters(rng):
    mu, omega, alpha, beta = 0.001, 5e-6, 0.10, 0.85
    r = simulate_garch11(6000, mu, omega, alpha, beta, rng)
    fit = fit_garch_11(r)
    assert abs(fit.mu - mu) < 5e-4
    assert abs(fit.alpha - alpha) < 0.06
    assert abs(fit.beta - beta) < 0.08
    # unconditional variance in the right range
    uncond = fit.omega / max(1 - fit.alpha - fit.beta, 1e-6)
    assert 0.3 < uncond / (omega / (1 - alpha - beta)) < 3.0


def test_garch_variance_forecast_recursion():
    from mcport.models.garch import Garch11Fit

    fit = Garch11Fit(mu=0.0, omega=1e-5, alpha=0.1, beta=0.8,
                     last_eps2=4e-4, last_sigma2=3e-4, loglik=0.0)
    v = forecast_garch_variance(fit, 3)
    v1 = 1e-5 + 0.1 * 4e-4 + 0.8 * 3e-4
    v2 = 1e-5 + 0.9 * v1
    v3 = 1e-5 + 0.9 * v2
    np.testing.assert_allclose(v, [v1, v2, v3], atol=1e-15)


def test_forecast_prices_structure(rng):
    prices = 100 * np.cumprod(1 + rng.normal(0.002, 0.03, 300))
    out = forecast_prices(prices)
    assert set(out) == {1, 3, 6}  # reference horizons (app.py:789)
    for h, f in out.items():
        lo, hi = f.conf_int
        assert lo < f.price < hi
        assert not f.fallback
        assert 0.2 * prices[-1] < f.price < 5 * prices[-1]
    # longer horizon → wider (or equal) CI in log terms
    w = {h: np.log(f.conf_int[1] / f.conf_int[0]) for h, f in out.items()}
    assert w[6] >= w[3] >= w[1]


def test_forecast_ci_formula(rng):
    """CI == price * exp(±1.96 sqrt(sum var)) with the fitted GARCH (app.py:354-357)."""
    prices = 100 * np.cumprod(1 + rng.normal(0.001, 0.02, 250))
    returns = prices[1:] / prices[:-1] - 1.0
    out = forecast_prices(prices, ForecastConfig(horizons=(3,)))
    f = out[3]
    g = fit_garch_11(returns)
    band = 1.96 * np.sqrt(forecast_garch_variance(g, 3).sum())
    np.testing.assert_allclose(f.conf_int[0], f.price * np.exp(-band), rtol=1e-9)
    np.testing.assert_allclose(f.conf_int[1], f.price * np.exp(band), rtol=1e-9)


def test_fallback_on_degenerate_series():
    """Too-short series → the reference's ±10% bare-except path (app.py:362-363)."""
    out = forecast_prices(np.array([100.0, 101.0, 102.0]))
    for h, f in out.items():
        assert f.fallback
        assert f.price == pytest.approx(102.0)
        assert f.conf_int == (pytest.approx(102.0 * 0.9), pytest.approx(102.0 * 1.1))


def test_forecast_on_fixture_data(fixtures_dir):
    from mcport.config import DataConfig
    from mcport.data import load_universe

    d = load_universe(paths=[fixtures_dir / "ETH_USD 7 Years Weekly.csv"],
                      config=DataConfig(period="W"))
    out = forecast_prices(d.prices[:, 0])
    last = d.prices[-1, 0]
    for h, f in out.items():
        assert not f.fallback
        assert 0.1 * last < f.price < 10 * last


# ---- exact-MLE (Kalman) estimator (VERDICT r1 item 8) ---------------------------

def _arma11_cov(phi, theta, sigma2, n):
    """Dense ARMA(1,1) autocovariance matrix (textbook closed form)."""
    g = np.empty(n)
    g[0] = sigma2 * (1 + 2 * phi * theta + theta**2) / (1 - phi**2)
    if n > 1:
        g[1] = sigma2 * (1 + phi * theta) * (phi + theta) / (1 - phi**2)
    for k in range(2, n):
        g[k] = phi * g[k - 1]
    i = np.arange(n)
    return g[np.abs(i[:, None] - i[None, :])]


def test_kalman_loglik_matches_dense_mvn(rng):
    """The scan Kalman filter's exact log-likelihood == dense multivariate-normal
    logpdf under the stationary ARMA(1,1) covariance (the defining property of
    'exact MLE' vs CSS)."""
    from mcport.models.arima import kalman_loglik_arma11

    phi, theta, sigma2 = 0.55, -0.25, 0.02**2
    y = simulate_arma11(64, phi, theta, np.sqrt(sigma2), rng)
    cov = _arma11_cov(phi, theta, sigma2, y.size)
    sign, logdet = np.linalg.slogdet(cov)
    assert sign > 0
    quad = y @ np.linalg.solve(cov, y)
    want = -0.5 * (y.size * np.log(2 * np.pi) + logdet + quad)
    got = kalman_loglik_arma11(phi, theta, sigma2, y)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_mle_recovers_parameters(rng):
    phi, theta = 0.6, -0.3
    y = simulate_arma11(4000, phi, theta, 0.02, rng)
    x = np.concatenate([[0.0], np.cumsum(y)])
    fit = fit_arima_111(x, method="mle")
    assert fit.method == "mle" and fit.loglik is not None
    assert abs(fit.phi - phi) < 0.08
    assert abs(fit.theta - theta) < 0.10
    assert abs(fit.sigma2 - 0.02**2) / 0.02**2 < 0.15


def test_mle_loglik_dominates_css_params(rng):
    """At the MLE optimum the exact log-likelihood must be >= the exact
    log-likelihood evaluated at the CSS estimates (definition of the argmax)."""
    from mcport.models.arima import kalman_loglik_arma11

    y = simulate_arma11(600, 0.5, 0.2, 0.05, rng)
    x = np.concatenate([[0.0], np.cumsum(y)])
    mle = fit_arima_111(x, method="mle")
    css = fit_arima_111(x, method="css")
    ll_mle = kalman_loglik_arma11(mle.phi, mle.theta, mle.sigma2, y)
    # concentrated sigma2 at the CSS point for a fair comparison
    from mcport.models.arima import _kalman_filter_arma11
    import jax.numpy as jnp
    ssq, _, _ = _kalman_filter_arma11(jnp.asarray([css.phi, css.theta]), jnp.asarray(y))
    ll_css = kalman_loglik_arma11(css.phi, css.theta, float(ssq) / y.size, y)
    assert ll_mle >= ll_css - 1e-6


def test_css_vs_mle_drift_quantified_on_fixture(fixtures_dir):
    """Quantify the round-1 concern: CSS and exact MLE differ, but on the
    fixture weekly-return series the drift is small (same estimator family as
    statsmodels default vs its CSS option)."""
    from mcport.config import DataConfig
    from mcport.data import load_universe

    d = load_universe(
        paths=[fixtures_dir / "BTC_USD 7 Years Weekly.csv"],
        config=DataConfig(period="W"),
    )
    returns = np.asarray(d.stats_rets[:, 0], np.float64)
    mle = fit_arima_111(returns, method="mle")
    css = fit_arima_111(returns, method="css")
    # drift exists but stays within a tight band on this 360-point series
    assert abs(mle.phi - css.phi) < 0.15
    assert abs(mle.theta - css.theta) < 0.15
    # and the two produce forecasts within a fraction of the weekly vol
    f_mle = forecast_arima(mle, 6)
    f_css = forecast_arima(css, 6)
    scale = max(1e-9, np.std(returns))
    assert np.max(np.abs(f_mle - f_css)) < 0.5 * scale


def test_mle_forecast_uses_state_prediction(rng):
    y = simulate_arma11(500, 0.4, 0.3, 0.03, rng)
    x = np.concatenate([[1.0], 1.0 + np.cumsum(y)])
    fit = fit_arima_111(x, method="mle")
    f = forecast_arima(fit, 4)
    dy1 = fit.state_a1
    dy2 = fit.phi * dy1 + fit.state_a2
    dy3 = fit.phi * dy2
    dy4 = fit.phi * dy3
    np.testing.assert_allclose(f, fit.last_level + np.cumsum([dy1, dy2, dy3, dy4]),
                               rtol=1e-10)


def test_bad_method_rejected():
    with pytest.raises(ValueError, match="method"):
        fit_arima_111(np.arange(10.0), method="exact")
