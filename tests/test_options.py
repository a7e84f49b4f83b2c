"""Options engine vs NumPy oracles restating app.py:164-229, plus strategy expansion."""

import numpy as np
import pytest

from mcport.options import (
    Legs,
    LegType,
    STRATEGIES,
    calculate_breakeven,
    calculate_payoff,
    position_return_series,
    price_grid,
    profit_loss_percent,
    strategy_legs,
)

ATOL = 1e-9


# ---- NumPy oracle: per-period leg return (app.py:164-180) -------------------
def np_leg_return(t, price, prev, strike, premium):
    if prev == 0:
        return 0.0
    if t == LegType.BUY_ASSET:
        return (price - prev) / prev
    if t == LegType.SELL_ASSET:
        return (prev - price) / prev
    if t == LegType.BUY_CALL:
        return (max(price - strike, 0) - premium) / prev
    if t == LegType.SELL_CALL:
        return (premium - max(price - strike, 0)) / prev
    if t == LegType.BUY_PUT:
        return (max(strike - price, 0) - premium) / prev
    if t == LegType.SELL_PUT:
        return (premium - max(strike - price, 0)) / prev
    if t == LegType.SELL_FUTURES:
        return (prev - price) / prev
    return 0.0


def np_series(rows, prices):
    """Oracle for calc_options_series (app.py:182-193)."""
    rets = np.zeros(len(prices))
    prev = prices[0]
    for i in range(1, len(prices)):
        rets[i] = sum(q * np_leg_return(t, prices[i], prev, k, p) for t, k, p, q in rows)
        prev = prices[i]
    return rets


def np_payoff(rows, purchase, grid):
    """Oracle for calculate_payoff (app.py:195-216)."""
    total_prem = sum(q * p * purchase for _, _, p, q in rows if p != 0)
    out = []
    for price in grid:
        tot = 0.0
        for t, k, p, q in rows:
            if t == LegType.BUY_ASSET:
                tot += q * (price - purchase)
            elif t == LegType.SELL_ASSET:
                tot += q * (purchase - price)
            elif t == LegType.BUY_CALL:
                tot += q * (max(price - k, 0) - p * purchase)
            elif t == LegType.SELL_CALL:
                tot += q * (p * purchase - max(price - k, 0))
            elif t == LegType.BUY_PUT:
                tot += q * (max(k - price, 0) - p * purchase)
            elif t == LegType.SELL_PUT:
                tot += q * (p * purchase - max(k - price, 0))
            elif t == LegType.SELL_FUTURES:
                tot += q * (purchase - price)
        out.append(tot - total_prem)
    return np.array(out)


ALL_LEGS = [
    (LegType.BUY_ASSET, 0.0, 0.0, 1.0),
    (LegType.SELL_ASSET, 0.0, 0.0, 0.5),
    (LegType.BUY_CALL, 105.0, 0.02, 2.0),
    (LegType.SELL_CALL, 110.0, 0.01, 1.0),
    (LegType.BUY_PUT, 95.0, 0.03, 1.5),
    (LegType.SELL_PUT, 90.0, 0.02, 1.0),
    (LegType.SELL_FUTURES, 0.0, 0.0, 0.25),
]


@pytest.fixture(scope="module")
def prices(rng):
    return 100.0 * np.cumprod(1 + rng.normal(0.002, 0.04, 50))


def test_series_matches_oracle(prices):
    legs = Legs.from_rows(ALL_LEGS)
    got = np.asarray(position_return_series(legs, prices))
    want = np_series(ALL_LEGS, prices)
    np.testing.assert_allclose(got, want, atol=ATOL)
    assert got[0] == 0.0


def test_series_zero_prev_price():
    legs = Legs.from_rows([(LegType.BUY_ASSET, 0, 0, 1.0)])
    prices = np.array([0.0, 10.0, 20.0])
    got = np.asarray(position_return_series(legs, prices))
    assert got[1] == 0.0  # prev_price == 0 guard (app.py:166)
    assert got[2] == 1.0


def test_empty_legs(prices):
    legs = Legs.from_rows([])
    np.testing.assert_allclose(np.asarray(position_return_series(legs, prices)), 0.0)


def test_payoff_matches_oracle(prices):
    legs = Legs.from_rows(ALL_LEGS)
    grid = np.asarray(price_grid(100.0))
    assert len(grid) == 100 and grid[0] == 50.0 and grid[-1] == 150.0
    got = np.asarray(calculate_payoff(legs, 98.0, grid))
    np.testing.assert_allclose(got, np_payoff(ALL_LEGS, 98.0, grid), atol=1e-8)


def test_breakeven_first_leg_heuristic():
    purchase = 100.0
    # first long-option leg → strike + total_premium/qty (app.py:220-222)
    legs = Legs.from_rows([
        (LegType.BUY_ASSET, 0, 0, 1.0),
        (LegType.BUY_PUT, 90.0, 0.02, 2.0),
    ])
    tp = 2.0 * 0.02 * purchase
    assert calculate_breakeven(legs, purchase) == pytest.approx(90.0 + tp / 2.0)
    # first short-option leg → strike - total_premium/qty (app.py:223-224)
    legs2 = Legs.from_rows([(LegType.SELL_CALL, 110.0, 0.01, 1.0)])
    assert calculate_breakeven(legs2, purchase) == pytest.approx(110.0 - 1.0)
    # no option legs → purchase + total_premium (app.py:225)
    legs3 = Legs.from_rows([(LegType.BUY_ASSET, 0, 0, 1.0)])
    assert calculate_breakeven(legs3, purchase) == pytest.approx(100.0)


def test_profit_loss_percent():
    p = np.array([10.0, -5.0])
    np.testing.assert_allclose(np.asarray(profit_loss_percent(p, 100.0, 2.0)), [5.0, -2.5])
    np.testing.assert_allclose(np.asarray(profit_loss_percent(p, 0.0, 2.0)), [0.0, 0.0])


def test_persian_leg_names_roundtrip():
    legs = Legs.from_rows([("خرید کال", 100.0, 0.01, 1.0), ("فروش فیوچرز", 0, 0, 2.0)])
    rows = legs.rows()
    assert rows[0][0] == LegType.BUY_CALL
    assert rows[1][0] == LegType.SELL_FUTURES


# ---- strategies (app.py:507-581) --------------------------------------------
def test_strategy_expansions():
    spot = 200.0
    mp = strategy_legs("Married Put", spot, qty_asset=3.0)
    assert [r[0] for r in mp.rows()] == [LegType.BUY_ASSET, LegType.BUY_PUT]
    assert mp.rows()[1][1] == pytest.approx(spot * 0.9)   # default put strike
    assert mp.rows()[0][3] == 3.0

    cc = strategy_legs("Covered Call", spot)
    assert [r[0] for r in cc.rows()] == [LegType.SELL_CALL]
    assert cc.rows()[0][1] == pytest.approx(spot * 1.1)   # default call strike

    cl = strategy_legs("Collar", spot)
    assert [r[0] for r in cl.rows()] == [LegType.BUY_PUT, LegType.SELL_CALL]

    bps = strategy_legs("Bear Put Spread", spot)
    assert [r[0] for r in bps.rows()] == [LegType.BUY_PUT, LegType.SELL_PUT]
    assert bps.rows()[0][1] == pytest.approx(spot)        # high strike = spot
    assert bps.rows()[1][1] == pytest.approx(spot * 0.9)

    sp = strategy_legs("Synthetic Put", spot, qty_asset=2.0)
    assert [r[0] for r in sp.rows()] == [LegType.SELL_FUTURES, LegType.BUY_CALL]
    assert sp.rows()[0][3] == 2.0

    ls = strategy_legs("Long Straddle/Strangle", spot)
    assert [r[0] for r in ls.rows()] == [LegType.BUY_CALL, LegType.BUY_PUT]
    assert ls.rows()[0][1] == ls.rows()[1][1] == pytest.approx(spot)


def test_strategy_names_match_reference():
    assert set(STRATEGIES) == {
        "Married Put", "Protective Put", "Covered Call", "Collar",
        "Bear Put Spread", "Synthetic Put", "Long Straddle/Strangle",
    }
    assert len(strategy_legs("-", 100.0)) == 0
    with pytest.raises(ValueError):
        strategy_legs("Iron Condor", 100.0)
