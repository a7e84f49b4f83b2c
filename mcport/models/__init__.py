from mcport.models.gbm import (
    GBMParams,
    estimate_gbm,
    portfolio_terminal_returns,
    simulate_log_paths,
    terminal_log_returns,
    terminal_log_returns_exact,
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
]
