"""Terminal payoff curves, breakeven, and P/L% (app.py:195-229).

Semantics parity notes:

* premiums are quoted as a *fraction of the purchase price* — every payoff branch
  scales ``premium * purchase_price`` (app.py:206-212), and the total premium sums
  ``qty * premium * purchase_price`` over legs with nonzero premium (app.py:197).
* the total premium is subtracted from every grid point (app.py:215) — note this
  double-counts premiums relative to the per-leg terms; that is the reference's
  behavior and is preserved.
* breakeven uses the reference's first-leg heuristic (app.py:218-225): the first
  long-option leg gives ``strike + total_premium/qty``, the first short-option leg
  ``strike - total_premium/qty``; positions with no option legs fall through to
  ``purchase_price + total_premium``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from mcport.config import PayoffConfig
from mcport.options.legs import Legs, LegType

__all__ = ["price_grid", "calculate_payoff", "calculate_breakeven", "profit_loss_percent"]


def price_grid(current_price: float, config: PayoffConfig = PayoffConfig()) -> Array:
    """The payoff evaluation grid: 100 points over 0.5x-1.5x spot (app.py:593)."""
    return jnp.linspace(
        current_price * config.lo_mult, current_price * config.hi_mult, config.n_points
    )


def total_premium(legs: Legs, purchase_price: float) -> Array:
    """sum(qty * premium * purchase_price) over legs with premium != 0 (app.py:197)."""
    prem = jnp.asarray(legs.premium)
    qty = jnp.asarray(legs.qty)
    return jnp.sum(jnp.where(prem != 0, qty * prem * purchase_price, 0.0))


def calculate_payoff(legs: Legs, purchase_price: float, prices: Array) -> Array:
    """Terminal payoff of the position over a price grid (app.py:195-216).

    Vectorized over the grid; the reference's grid x legs double loop becomes one
    (G, L) broadcast.
    """
    prices = jnp.asarray(prices)
    if len(legs) == 0:
        return jnp.zeros_like(prices)
    p = prices[:, None]                                   # (G, 1)
    t_id = jnp.asarray(legs.type_id)[None, :]
    k = jnp.asarray(legs.strike, prices.dtype)[None, :]
    prem_scaled = jnp.asarray(legs.premium, prices.dtype)[None, :] * purchase_price
    q = jnp.asarray(legs.qty, prices.dtype)[None, :]
    call_iv = jnp.maximum(p - k, 0.0)
    put_iv = jnp.maximum(k - p, 0.0)
    branches = [
        p - purchase_price,        # BUY_ASSET
        purchase_price - p,        # SELL_ASSET
        call_iv - prem_scaled,     # BUY_CALL
        prem_scaled - call_iv,     # SELL_CALL
        put_iv - prem_scaled,      # BUY_PUT
        prem_scaled - put_iv,      # SELL_PUT
        purchase_price - p,        # SELL_FUTURES
    ]
    per_leg = jnp.select([t_id == t for t in range(7)], branches, 0.0)
    return jnp.sum(q * per_leg, axis=1) - total_premium(legs, purchase_price)


def calculate_breakeven(legs: Legs, purchase_price: float) -> float:
    """First-leg heuristic breakeven (app.py:218-225). Host-side scalar math."""
    tp = float(total_premium(legs, purchase_price))
    for t, strike, _prem, qty in legs.rows():
        if t in (LegType.BUY_PUT, LegType.BUY_CALL):
            return strike + tp / qty if qty != 0 else purchase_price
        if t in (LegType.SELL_PUT, LegType.SELL_CALL):
            return strike - tp / qty if qty != 0 else purchase_price
    return purchase_price + tp


def profit_loss_percent(payoffs: Array, purchase_price: float, qty_asset: float) -> Array:
    """Payoff → percent of invested capital (app.py:227-229)."""
    investment = purchase_price * qty_asset
    payoffs = jnp.asarray(payoffs)
    if investment == 0:
        return jnp.zeros_like(payoffs)
    return payoffs / investment * 100.0
