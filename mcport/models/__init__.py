from mcport.models.gbm import (
    GBMParams,
    estimate_gbm,
    portfolio_terminal_returns,
    simulate_log_paths,
    terminal_log_returns,
    terminal_log_returns_exact,
)
from mcport.models.arima import Arima111Fit, fit_arima_111, forecast_arima
from mcport.models.bridge import bridge_schedule, brownian_bridge, qmc_gbm_log_paths
from mcport.models.gbm import estimate_t_dof, terminal_log_returns_t  # noqa: F401
from mcport.models.importance import (
    TailRisk,
    importance_tail_risk,
    tilted_terminal_returns,
)
from mcport.models.jump import (
    MertonParams,
    estimate_merton_common,
    merton_risk,
    merton_terminal_returns,
)
from mcport.models.bootstrap import (
    BootstrapRisk,
    bootstrap_risk,
    bootstrap_terminal_returns,
)
from mcport.models.forecast import HorizonForecast, forecast_prices
from mcport.models.garch import Garch11Fit, fit_garch_11, forecast_garch_variance
from mcport.models.dcc import (
    DCCGarchParams,
    dcc_risk,
    dcc_terminal_returns,
    estimate_dcc_garch,
)
from mcport.models.garch_mc import (
    CCCGarchParams,
    estimate_ccc_garch,
    garch_terminal_returns,
    simulate_garch_returns,
)
from mcport.models.heston import (
    HestonParams,
    estimate_heston,
    heston_terminal_returns,
    simulate_heston_returns,
)
from mcport.models.qmc import halton, qmc_normals, sobol

__all__ = [
    "GBMParams",
    "estimate_gbm",
    "simulate_log_paths",
    "terminal_log_returns",
    "terminal_log_returns_exact",
    "portfolio_terminal_returns",
    "halton",
    "sobol",
    "qmc_normals",
    "Arima111Fit",
    "fit_arima_111",
    "forecast_arima",
    "Garch11Fit",
    "fit_garch_11",
    "forecast_garch_variance",
    "HorizonForecast",
    "forecast_prices",
    "BootstrapRisk",
    "bootstrap_risk",
    "bootstrap_terminal_returns",
    "estimate_t_dof",
    "terminal_log_returns_t",
    "MertonParams",
    "estimate_merton_common",
    "merton_risk",
    "merton_terminal_returns",
    "TailRisk",
    "importance_tail_risk",
    "tilted_terminal_returns",
    "bridge_schedule",
    "brownian_bridge",
    "qmc_gbm_log_paths",
    "CCCGarchParams",
    "estimate_ccc_garch",
    "simulate_garch_returns",
    "garch_terminal_returns",
    "DCCGarchParams",
    "estimate_dcc_garch",
    "dcc_terminal_returns",
    "dcc_risk",
    "HestonParams",
    "estimate_heston",
    "simulate_heston_returns",
    "heston_terminal_returns",
]
