"""Risk & statistics library (JAX).

Exact numerical ports of the reference risk functions at app.py:231-263:

- ``sharpe_ratio``      app.py:231-236  (per-period excess, ddof=1 std, x sqrt(ann))
- ``sortino_ratio``     app.py:238-243  (downside ddof=1 std, 0.0001 floor when no
                                         negative excess returns exist)
- ``annual_volatility`` app.py:245-246
- ``annual_return``     app.py:248-250  (geometric compounding)
- ``max_drawdown``      app.py:252-256  (cumprod / running peak)
- ``var``               app.py:258-259  (historical percentile, numpy 'linear' method)
- ``cvar``              app.py:261-263  (tail mean, falls back to VaR if tail empty)

All functions are pure jnp, jit/vmap-friendly, take explicit ``ann_factor`` and work
on a 1-D return series (vmap for batches). Semantics notes:

* stds use ddof=1 everywhere, matching ``np.std(..., ddof=1)``.
* ``sortino_ratio`` with exactly one negative excess return produces NaN in the
  reference (np.std of one sample with ddof=1); we reproduce that faithfully.
* ``var`` uses the 'linear' quantile interpolation (numpy default) so values match
  ``np.percentile`` bit-for-bit in float64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

__all__ = [
    "sharpe_ratio",
    "sortino_ratio",
    "annual_volatility",
    "annual_return",
    "max_drawdown",
    "var",
    "cvar",
    "std_ddof1",
]


def std_ddof1(x: Array, axis: int | None = None) -> Array:
    """Sample standard deviation with ddof=1 (np.std(x, ddof=1))."""
    x = jnp.asarray(x)
    return jnp.std(x, axis=axis, ddof=1)


def _is_zero_std(std: Array, scale: Array) -> Array:
    """True where a std is zero up to reduction-order rounding noise.

    numpy returns an exact 0.0 std for a constant array; XLA's reduction order
    can leave O(eps * |x|) noise instead, which would defeat the reference's
    ``std == 0`` guards (app.py:235) — compare against a scale-relative epsilon.
    """
    eps = jnp.finfo(std.dtype).eps
    return std <= 16.0 * eps * jnp.maximum(scale, jnp.finfo(std.dtype).tiny)


def sharpe_ratio(returns: Array, risk_free: float = 0.0, ann_factor: int = 12) -> Array:
    """Annualized Sharpe ratio of a per-period return series (app.py:231-236).

    rf is a *decimal annual* rate, de-annualized by simple division (rf/ann) exactly
    as the reference does.  Returns 0 when the std is 0.
    """
    excess = jnp.asarray(returns) - risk_free / ann_factor
    mean = jnp.mean(excess)
    std = std_ddof1(excess)
    ratio = (mean / std) * jnp.sqrt(jnp.asarray(ann_factor, dtype=excess.dtype))
    zero = _is_zero_std(std, jnp.max(jnp.abs(excess)))
    return jnp.where(zero, jnp.zeros_like(ratio), ratio)


def sortino_ratio(returns: Array, risk_free: float = 0.0, ann_factor: int = 12) -> Array:
    """Annualized Sortino ratio (app.py:238-243).

    Downside std over strictly negative excess returns (ddof=1); when no negative
    excess return exists the reference substitutes 0.0001.
    """
    excess = jnp.asarray(returns) - risk_free / ann_factor
    mean = jnp.mean(excess)
    neg = excess < 0
    n_neg = jnp.sum(neg)
    # masked ddof=1 std over the negative subset
    neg_sum = jnp.sum(jnp.where(neg, excess, 0.0))
    neg_mean = neg_sum / jnp.maximum(n_neg, 1)
    sq = jnp.where(neg, (excess - neg_mean) ** 2, 0.0)
    # n_neg==1 divides by zero -> nan, matching np.std(1 sample, ddof=1)
    downside_var = jnp.sum(sq) / (n_neg - 1)
    downside_std = jnp.where(n_neg > 0, jnp.sqrt(downside_var), jnp.asarray(1e-4, excess.dtype))
    return (mean / downside_std) * jnp.sqrt(jnp.asarray(ann_factor, dtype=excess.dtype))


def annual_volatility(returns: Array, ann_factor: int = 12) -> Array:
    """Annualized volatility: ddof=1 std x sqrt(ann) (app.py:245-246)."""
    r = jnp.asarray(returns)
    return std_ddof1(r) * jnp.sqrt(jnp.asarray(ann_factor, dtype=r.dtype))


def annual_return(returns: Array, ann_factor: int = 12) -> Array:
    """Geometric annualized return: prod(1+r)^(ann/n) - 1 (app.py:248-250)."""
    r = jnp.asarray(returns)
    n = r.shape[-1] if r.ndim else r.size
    compounded = jnp.prod(1.0 + r, axis=-1) ** (ann_factor / n) - 1.0
    return compounded


def max_drawdown(returns: Array) -> Array:
    """Maximum drawdown of the cumulative-product equity curve (app.py:252-256)."""
    r = jnp.asarray(returns)
    cumulative = jnp.cumprod(1.0 + r, axis=-1)
    peak = jax.lax.cummax(cumulative, axis=r.ndim - 1)
    drawdown = (cumulative - peak) / peak
    return jnp.min(drawdown, axis=-1)


def var(returns: Array, alpha: float = 0.95) -> Array:
    """Historical Value-at-Risk: the (1-alpha) percentile of realized returns
    (app.py:258-259). Linear interpolation, matching np.percentile's default."""
    r = jnp.asarray(returns)
    return jnp.percentile(r, (1.0 - alpha) * 100.0, axis=-1, method="linear")


def cvar(returns: Array, alpha: float = 0.95) -> Array:
    """Conditional VaR: mean of returns <= VaR; falls back to VaR itself when the
    tail is empty (app.py:261-263)."""
    r = jnp.asarray(returns)
    v = var(r, alpha)
    tail = r <= v[..., None] if r.ndim > 1 else r <= v
    n_tail = jnp.sum(tail, axis=-1)
    tail_mean = jnp.sum(jnp.where(tail, r, 0.0), axis=-1) / jnp.maximum(n_tail, 1)
    return jnp.where(n_tail > 0, tail_mean, v)
