"""mcport — a TPU-native Monte-Carlo portfolio framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``mohammadmarghzari/monte-carlo-portfolio`` (a Streamlit portfolio simulator):
data ingestion, risk statistics, option-hedging strategies, random-weight +
exact (PGD QP) portfolio optimization, seven tail-risk model families (GBM with
normal or Student-t innovations, CCC-GARCH(+t), DCC-GARCH, Merton systemic
jumps, Heston stochastic volatility, stationary block bootstrap) on fused TPU
kernels, mesh-sharded reductions with
bit-exact checkpoint/resume and elastic recovery, ARIMA (exact Kalman MLE) +
GARCH forecasting, and a UI parity layer.

Layers (SURVEY.md §7): data → stats → options → models/ops → parallel → engine →
api/cli → ui. Everything below the pandas ingestion boundary is pure JAX.
"""

__version__ = "0.2.0"

import os as _os
import sys as _sys

# TPUs run f32 matmuls with SINGLE-PASS bf16 operands by default (measured
# 2.4e-3 relative error on this v5e vs 1e-7 at explicit float32 precision).
# For a risk framework that promises 1e-6 parity with its NumPy reference,
# that silent truncation is wrong-by-default: force float32 matmul precision
# process-wide. Fast paths that WANT bf16 operands request them explicitly
# (e.g. the drawdown kernel's score_dtype="bfloat16"), which this setting
# does not affect. Override with MCPORT_MATMUL_PRECISION=default to restore
# JAX's own default, or any valid jax_default_matmul_precision value.
_prec = _os.environ.get("MCPORT_MATMUL_PRECISION", "float32")
if _prec != "default":
    if "jax" in _sys.modules:  # jax imported first: set the live config
        _sys.modules["jax"].config.update("jax_default_matmul_precision", _prec)
    else:  # not yet imported: the env var is read at jax import time
        _os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", _prec)
del _os, _sys, _prec

from mcport.config import Config, DataConfig, ForecastConfig, GBMConfig, MeshConfig
from mcport.config import PayoffConfig, PortfolioConfig, SimulationConfig, SketchConfig


def __getattr__(name):
    """Lazy re-exports of the workflow API (mcport.load_universe, mcport.simulate,
    ...) without importing jax/pandas at package-import time."""
    _API = ("load_universe", "compute_stats", "simulate", "gbm_risk",
            "hedged_tail_risk",
            "bootstrap_tail_risk", "exact_mv_frontier", "exact_cvar_frontier",
            "exact_cdar_frontier",
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
