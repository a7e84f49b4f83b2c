"""Error bars for the HISTORICAL statistics tier (the reference's own numbers).

The reference reports Sharpe/VaR/CVaR/max-drawdown of 24-365-row return
series (/root/reference/app.py:231-335) as bare points — exactly the regime
where sampling error is largest (a weekly crypto Sharpe at T=365 carries a
standard error of ~0.05·√ann). This module bootstraps those statistics.

Resampling design: the **stationary block bootstrap** (Politis-Romano
geometric block lengths, circular wraparound — the same law as the
simulated bootstrap family, :mod:`mcport.models.bootstrap`). Financial
returns are serially dependent (volatility clustering), and max drawdown is
order-dependent outright, so an iid resample would understate the error of
every variance-sensitive statistic; ``p_restart=1.0`` degenerates to the
iid bootstrap for calibration tests. Statistics per replicate reuse the
golden-tested reference semantics in :mod:`mcport.stats.risk` (ddof=1,
linear percentile, tail-mean-or-VaR fallback), vmapped over replicates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from mcport.stats.risk import (
    annual_return, cvar, max_drawdown, sharpe_ratio, var,
)

__all__ = ["historical_stat_cis", "stationary_bootstrap_indices"]


def stationary_bootstrap_indices(
    rng: np.random.Generator, t: int, n_boot: int, p_restart: float = 0.1
) -> np.ndarray:
    """(n_boot, t) circular stationary-bootstrap index matrix.

    Each row starts at a uniform position and continues ``i+1 (mod t)`` with
    probability ``1 - p_restart``, restarting uniformly otherwise — expected
    block length ``1/p_restart``. Vectorized across replicates (one column at
    a time; t is a price history, tens to hundreds of rows)."""
    if not 0.0 < p_restart <= 1.0:
        raise ValueError(f"p_restart must be in (0, 1], got {p_restart}")
    idx = np.empty((n_boot, t), np.int64)
    idx[:, 0] = rng.integers(0, t, n_boot)
    for i in range(1, t):
        restart = rng.random(n_boot) < p_restart
        idx[:, i] = np.where(restart, rng.integers(0, t, n_boot),
                             (idx[:, i - 1] + 1) % t)
    return idx


@functools.partial(jax.jit, static_argnames=("ann_factor", "alpha", "level"))
def _replicate_stats(samples: Array, risk_free: float, ann_factor: int,
                     alpha: float, level: float):
    def one(r):
        return jnp.stack([
            sharpe_ratio(r, risk_free, ann_factor),
            annual_return(r, ann_factor),
            var(r, alpha),
            cvar(r, alpha),
            max_drawdown(r),
        ])

    stats = jax.vmap(one)(samples)                      # (B, 5)
    lo_q, hi_q = (1.0 - level) / 2.0, 1.0 - (1.0 - level) / 2.0
    qs = jnp.quantile(stats, jnp.array([lo_q, hi_q], stats.dtype), axis=0)
    return jnp.std(stats, axis=0, ddof=1), qs[0], qs[1]


_STAT_KEYS = ("sharpe", "total_return_ann", "var_95", "cvar_95",
              "max_drawdown")


def historical_stat_cis(
    returns: np.ndarray,
    risk_free: float = 0.0,
    ann_factor: int = 12,
    alpha: float = 0.95,
    n_boot: int = 500,
    seed: int = 0,
    p_restart: float = 0.1,
    level: float = 0.95,
) -> dict[str, dict[str, float]]:
    """{stat: {se, lo, hi}} for the reference's headline statistics of one
    (T,) return series, by stationary block bootstrap (see module docstring).
    ``p_restart=1.0`` gives the iid bootstrap."""
    r = np.asarray(returns, np.float32).reshape(-1)
    t = r.shape[0]
    if t < 8:
        raise ValueError(f"need at least 8 return rows for a bootstrap, got {t}")
    rng = np.random.default_rng(seed)
    idx = stationary_bootstrap_indices(rng, t, n_boot, p_restart)
    se, lo, hi = _replicate_stats(jnp.asarray(r)[jnp.asarray(idx)],
                                  float(risk_free), int(ann_factor),
                                  float(alpha), float(level))
    se, lo, hi = (np.asarray(x, np.float64) for x in (se, lo, hi))
    return {
        k: {"se": float(se[i]), "lo": float(lo[i]), "hi": float(hi[i])}
        for i, k in enumerate(_STAT_KEYS)
    }
