"""Per-asset statistics table (JAX core of app.py:286-335, ``calc_asset_stats``).

The reference resamples prices inside the stats function; mcport splits that:
pandas-side resampling lives in :mod:`mcport.data.pipeline`, while this module is the
pure-jnp core operating on an already-resampled per-period return series. It computes
the same 16 statistics, in the same column order as the tab-0 table (app.py:490-494).

``asset_stats_batch`` vmaps the whole table over an ``(A, T)`` return matrix so all
assets compute in one fused XLA program.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import Array

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

# All 16 computed statistics, in the reference's calc_asset_stats dict order
# (app.py:317-334) — note min_ann/max_ann before min_month/max_month there.
STAT_COLUMNS = (
    "sharpe",
    "sortino",
    "volatility_ann",
    "total_return_ann",
    "implied_vol",
    "mean_ann",
    "mean_month",
    "std_ann",
    "std_month",
    "min_ann",
    "max_ann",
    "min_month",
    "max_month",
    "max_drawdown",
    "var_95",
    "cvar_95",
)

# The 15 columns the tab-0 table actually DISPLAYS, in display order
# (app.py:490-494): max_drawdown is computed but not shown, and the min/max
# columns reorder to min_ann, min_month, max_ann, max_month.
DISPLAY_COLUMNS = (
    "sharpe",
    "sortino",
    "volatility_ann",
    "total_return_ann",
    "implied_vol",
    "mean_ann",
    "mean_month",
    "std_ann",
    "std_month",
    "min_ann",
    "min_month",
    "max_ann",
    "max_month",
    "var_95",
    "cvar_95",
)


def asset_stats(
    returns: Array, ann_factor: int = 12, risk_free: float = 0.0
) -> Dict[str, Array]:
    """All 16 per-asset statistics of app.py:300-335 for one return series.

    "month" in the stat names means "per analysis period" — the reference keeps the
    monthly naming even for weekly/quarterly periods (app.py:307-330).
    """
    r = jnp.asarray(returns)
    sqrt_ann = jnp.sqrt(jnp.asarray(ann_factor, dtype=r.dtype))
    std_p = std_ddof1(r)
    return {
        "sharpe": sharpe_ratio(r, risk_free, ann_factor),
        "sortino": sortino_ratio(r, risk_free, ann_factor),
        "volatility_ann": annual_volatility(r, ann_factor),
        "total_return_ann": annual_return(r, ann_factor),
        # 'implied_vol' in the reference is literally ddof=1 std x sqrt(ann)
        # (app.py:304) — identical to volatility_ann; kept for table parity.
        "implied_vol": std_p * sqrt_ann,
        "mean_ann": jnp.mean(r) * ann_factor,
        "mean_month": jnp.mean(r),
        "std_ann": std_p * sqrt_ann,
        "std_month": std_p,
        "min_ann": jnp.min(r) * ann_factor,
        "max_ann": jnp.max(r) * ann_factor,
        "min_month": jnp.min(r),
        "max_month": jnp.max(r),
        "max_drawdown": max_drawdown(r),
        "var_95": var(r, 0.95),
        "cvar_95": cvar(r, 0.95),
    }


def asset_stats_batch(
    returns: Array, ann_factor: int = 12, risk_free: float = 0.0
) -> Dict[str, Array]:
    """Vmapped :func:`asset_stats` over an (A, T) return matrix → dict of (A,) arrays."""
    fn = jax.vmap(lambda row: asset_stats(row, ann_factor, risk_free))
    return fn(jnp.asarray(returns))
