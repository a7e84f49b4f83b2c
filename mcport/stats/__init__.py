from mcport.stats.asset_stats import DISPLAY_COLUMNS, STAT_COLUMNS, asset_stats, asset_stats_batch
from mcport.stats.ci import historical_stat_cis, stationary_bootstrap_indices
from mcport.stats.risk import (
    annual_return,
    annual_volatility,
    cvar,
    max_drawdown,
    sharpe_ratio,
    sortino_ratio,
    std_ddof1,
    var,
)

__all__ = [
    "sharpe_ratio",
    "sortino_ratio",
    "annual_volatility",
    "annual_return",
    "max_drawdown",
    "var",
    "cvar",
    "std_ddof1",
    "asset_stats",
    "asset_stats_batch",
    "STAT_COLUMNS",
    "DISPLAY_COLUMNS",
    "historical_stat_cis",
    "stationary_bootstrap_indices",
]
