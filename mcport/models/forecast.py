"""Price forecaster — parity with ``forecast_prices`` (app.py:337-364).

Per horizon h in the configured list (default [1, 3, 6], app.py:789):

1. ARIMA(1,1,1) on *returns* for the trend (app.py:343-345);
2. GARCH(1,1) on returns for the variance path (app.py:347-350);
3. point forecast ``last_price * prod(1 + r_hat)`` (app.py:352-353);
4. 95% CI ``price * exp(±1.96 * sqrt(sum(variance)))`` (app.py:354-357);
5. any failure falls back to ``last_price ± 10%`` — the reference's bare-except
   (app.py:362-363), kept as the engine's recoverable-error semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping, Sequence

import numpy as np

from mcport.config import ForecastConfig
from mcport.models.arima import fit_arima_111, forecast_arima
from mcport.models.garch import fit_garch_11, forecast_garch_variance

__all__ = ["HorizonForecast", "forecast_prices"]


@dataclass(frozen=True)
class HorizonForecast:
    price: float
    conf_int: tuple[float, float]
    fallback: bool = False   # True when the ±10% bare-except path was taken


def forecast_prices(
    prices: np.ndarray | Sequence[float],
    config: ForecastConfig = ForecastConfig(),
) -> Mapping[int, HorizonForecast]:
    """Forecast a price series at each configured horizon.

    Input is the (resampled) price series for one asset, exactly as tab 3 passes
    it (app.py:792). Returns {horizon: HorizonForecast}.
    """
    p = np.asarray(prices, np.float64)
    last_price = float(p[-1])
    returns = p[1:] / p[:-1] - 1.0  # pct_change().dropna() (app.py:338)

    out: dict[int, HorizonForecast] = {}
    for horizon in config.horizons:
        try:
            arima = fit_arima_111(returns)
            r_hat = forecast_arima(arima, horizon)            # forecast returns
            garch = fit_garch_11(returns)
            variance = forecast_garch_variance(garch, horizon)
            forecast_price = last_price * float(np.prod(1.0 + r_hat))
            if not np.isfinite(forecast_price):
                raise FloatingPointError("non-finite forecast")
            band = config.ci_z * float(np.sqrt(variance.sum()))
            out[horizon] = HorizonForecast(
                price=forecast_price,
                conf_int=(
                    forecast_price * float(np.exp(-band)),
                    forecast_price * float(np.exp(band)),
                ),
            )
        except Exception:
            out[horizon] = HorizonForecast(
                price=last_price,
                conf_int=(
                    last_price * (1.0 - config.fallback_band),
                    last_price * (1.0 + config.fallback_band),
                ),
                fallback=True,
            )
    return out
