"""Option-leg model (app.py:164-193).

The reference encodes a position leg as a tuple ``(type, strike, premium, qty)``
where type is one of 7 Persian strings (app.py:164-180). mcport encodes the type as
an :class:`LegType` IntEnum (keeping the Persian names as parse/display aliases) and
a multi-leg position as a :class:`Legs` struct-of-arrays so the whole position
evaluates as one fused XLA program — the reference's hottest Python loop,
``calc_options_series`` (app.py:182-193, time x legs double loop), becomes a single
vectorized broadcast here.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from jax import Array

__all__ = ["LegType", "Legs", "leg_period_return", "position_return_series"]


class LegType(enum.IntEnum):
    """The 7 leg types of app.py:164-180, with their Persian reference names."""

    BUY_ASSET = 0      # خرید دارایی
    SELL_ASSET = 1     # فروش دارایی
    BUY_CALL = 2       # خرید کال
    SELL_CALL = 3      # فروش کال
    BUY_PUT = 4        # خرید پوت
    SELL_PUT = 5       # فروش پوت
    SELL_FUTURES = 6   # فروش فیوچرز


PERSIAN_NAMES = {
    LegType.BUY_ASSET: "خرید دارایی",
    LegType.SELL_ASSET: "فروش دارایی",
    LegType.BUY_CALL: "خرید کال",
    LegType.SELL_CALL: "فروش کال",
    LegType.BUY_PUT: "خرید پوت",
    LegType.SELL_PUT: "فروش پوت",
    LegType.SELL_FUTURES: "فروش فیوچرز",
}
_FROM_PERSIAN = {v: k for k, v in PERSIAN_NAMES.items()}


def parse_leg_type(value: "LegType | str | int") -> LegType:
    """Accept a LegType, its name, its Persian reference string, or an int id."""
    if isinstance(value, LegType):
        return value
    if isinstance(value, int):
        return LegType(value)
    if value in _FROM_PERSIAN:
        return _FROM_PERSIAN[value]
    return LegType[value.upper()]


@dataclass(frozen=True)
class Legs:
    """Struct-of-arrays encoding of a multi-leg position.

    Mirrors the reference leg tuples (type, strike, premium, qty); rows evaluate
    together under vmap/broadcast.
    """

    type_id: np.ndarray   # (L,) int32
    strike: np.ndarray    # (L,) float
    premium: np.ndarray   # (L,) float
    qty: np.ndarray       # (L,) float

    @classmethod
    def from_rows(cls, rows: Sequence[tuple]) -> "Legs":
        """Build from reference-style rows [(type, strike, premium, qty), ...]."""
        if not rows:
            return cls(
                np.zeros(0, np.int32), np.zeros(0), np.zeros(0), np.zeros(0)
            )
        t, k, p, q = zip(*rows)
        return cls(
            np.array([int(parse_leg_type(x)) for x in t], np.int32),
            np.asarray(k, np.float64),
            np.asarray(p, np.float64),
            np.asarray(q, np.float64),
        )

    def rows(self) -> list[tuple]:
        return [
            (LegType(int(t)), float(k), float(p), float(q))
            for t, k, p, q in zip(self.type_id, self.strike, self.premium, self.qty)
        ]

    def __len__(self) -> int:
        return len(self.type_id)


def leg_period_return(
    type_id: Array, price: Array, prev_price: Array, strike: Array, premium: Array
) -> Array:
    """Per-period return of one leg given a price move (app.py:164-180).

    Intrinsic-value payoff minus/plus premium, normalized by the previous price;
    0 when the previous price is 0. Broadcasts over any leading shape.
    """
    call_iv = jnp.maximum(price - strike, 0.0)
    put_iv = jnp.maximum(strike - price, 0.0)
    up = price - prev_price
    branches = [
        up,                      # BUY_ASSET
        -up,                     # SELL_ASSET
        call_iv - premium,       # BUY_CALL
        premium - call_iv,       # SELL_CALL
        put_iv - premium,        # BUY_PUT
        premium - put_iv,        # SELL_PUT
        -up,                     # SELL_FUTURES
    ]
    numer = jnp.select([type_id == t for t in range(7)], branches, 0.0)
    safe_prev = jnp.where(prev_price == 0, 1.0, prev_price)
    return jnp.where(prev_price == 0, 0.0, numer / safe_prev)


def position_return_series(legs: Legs, prices: Array) -> Array:
    """Vectorized ``calc_options_series`` (app.py:182-193).

    Given prices (T,) and L legs, returns the (T,) per-period return series of the
    qty-weighted position: ``ret[t] = sum_l qty_l * leg_return(l, p_t, p_{t-1})``,
    with ``ret[0] = 0``. The reference's time x legs double loop collapses to one
    (T-1, L) broadcast.
    """
    prices = jnp.asarray(prices)
    if len(legs) == 0:
        return jnp.zeros_like(prices)
    p = prices[1:, None]          # (T-1, 1)
    pp = prices[:-1, None]        # (T-1, 1)
    t_id = jnp.asarray(legs.type_id)[None, :]
    k = jnp.asarray(legs.strike, prices.dtype)[None, :]
    prem = jnp.asarray(legs.premium, prices.dtype)[None, :]
    q = jnp.asarray(legs.qty, prices.dtype)[None, :]
    per_leg = leg_period_return(t_id, p, pp, k, prem)   # (T-1, L)
    rets = jnp.sum(q * per_leg, axis=1)
    return jnp.concatenate([jnp.zeros((1,), prices.dtype), rets])
