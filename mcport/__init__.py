"""mcport — a TPU-native Monte-Carlo portfolio framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``mohammadmarghzari/monte-carlo-portfolio`` (a Streamlit portfolio simulator):
data ingestion, risk statistics, option-hedging strategies, random-weight
portfolio search, correlated-GBM path simulation with fused TPU kernels,
mesh-sharded tail-risk reduction, ARIMA+GARCH forecasting, and a UI parity layer.

Layers (SURVEY.md §7): data → stats → options → models/ops → parallel → engine →
api/cli → ui. Everything below the pandas ingestion boundary is pure JAX.
"""

__version__ = "0.1.0"

from mcport.config import Config, DataConfig, ForecastConfig, GBMConfig, MeshConfig
from mcport.config import PayoffConfig, PortfolioConfig, SimulationConfig, SketchConfig

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
