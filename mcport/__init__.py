"""mcport — a TPU-native Monte-Carlo portfolio framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``mohammadmarghzari/monte-carlo-portfolio`` (a Streamlit portfolio simulator):
data ingestion, risk statistics, option-hedging strategies, random-weight +
exact (PGD QP) portfolio optimization, five tail-risk model families (GBM with
normal or Student-t innovations, CCC-GARCH(+t), Merton systemic jumps,
stationary block bootstrap) on fused TPU kernels, mesh-sharded reductions with
bit-exact checkpoint/resume and elastic recovery, ARIMA (exact Kalman MLE) +
GARCH forecasting, and a UI parity layer.

Layers (SURVEY.md §7): data → stats → options → models/ops → parallel → engine →
api/cli → ui. Everything below the pandas ingestion boundary is pure JAX.
"""

__version__ = "0.2.0"

from mcport.config import Config, DataConfig, ForecastConfig, GBMConfig, MeshConfig
from mcport.config import PayoffConfig, PortfolioConfig, SimulationConfig, SketchConfig


def __getattr__(name):
    """Lazy re-exports of the workflow API (mcport.load_universe, mcport.simulate,
    ...) without importing jax/pandas at package-import time."""
    _API = ("load_universe", "compute_stats", "simulate", "gbm_risk",
            "bootstrap_tail_risk", "exact_mv_frontier", "exact_cvar_frontier",
            "risk_based_weights", "compare_tail_risk", "forecast")
    if name in _API:
        import mcport.api as _api

        return getattr(_api, name)
    raise AttributeError(f"module 'mcport' has no attribute {name!r}")

__all__ = [
    "Config",
    "DataConfig",
    "PortfolioConfig",
    "SimulationConfig",
    "GBMConfig",
    "SketchConfig",
    "MeshConfig",
    "ForecastConfig",
    "PayoffConfig",
    "__version__",
]
