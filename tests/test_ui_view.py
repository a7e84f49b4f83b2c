# -*- coding: utf-8 -*-
"""Pure view-model tests: the reference's plotting semantics, CI-testable
without streamlit/plotly (VERDICT r2 item 5).

Pinned semantics (file:line = /root/reference/app.py):
- payoff fill: main trace colored by sign of the LAST grid payoff (603-608);
  one overlay segment per adjacent zero-straddling pair, colored by the sign
  of the RIGHT endpoint (610-621); breakeven/spot dashed vlines (622-635);
  analysis lines in $ and % of purchase*qty (645-650).
- frontier: (std, ret) x100 of VALID candidates colored by metric with the
  per-method colorscale (726-736); MPT CAL y = rf*100 + sharpe* x out to
  1.3x max std (737-746); optimum marker (748-752); %/$ cards + dollar pie
  (761-783).
- forecast: x=0 current-price marker, "<price:.2f> $" labels, dashed CI
  segments (793-809).
"""

import numpy as np
import pytest

from mcport.engine.weight_search import METHODS
from mcport.options import Legs, LegType
from mcport.ui.view import forecast_view, frontier_view, payoff_view
from mcport.utils import format_money, format_percent

# premium is quoted as a FRACTION of purchase price in the payoff engine
# (app.py:197,206-212 scale premium * purchase_price): 0.02 = $2 at pp=100
MARRIED_PUT = Legs.from_rows([
    (LegType.BUY_ASSET, 0.0, 0.0, 1.0),
    (LegType.BUY_PUT, 90.0, 0.02, 1.0),
])


def test_payoff_view_reference_semantics():
    v = payoff_view(MARRIED_PUT, purchase_price=100.0, qty_asset=1.0, spot=100.0)
    # grid: 100 points, 0.5x-1.5x spot (app.py:593)
    assert v.grid.shape == (100,)
    assert v.grid[0] == pytest.approx(50.0) and v.grid[-1] == pytest.approx(150.0)
    # married put ends profitable at 1.5x: base fill green (sign of last)
    assert v.payoffs[-1] > 0 and v.base_color == "green"
    # exactly the zero-straddling pairs, colored by the right endpoint
    want = [(i, "green" if v.payoffs[i + 1] >= 0 else "red")
            for i in range(99) if v.payoffs[i] * v.payoffs[i + 1] < 0]
    assert len(v.segments) == len(want) >= 1
    for (x0, x1, y0, y1, color), (i, wcolor) in zip(v.segments, want):
        assert (x0, x1) == (v.grid[i], v.grid[i + 1])
        assert (y0, y1) == (v.payoffs[i], v.payoffs[i + 1])
        assert color == wcolor
    # vlines: breakeven (blue) then spot (gray)
    (bx, bc, bk), (sx, sc, sk) = v.vlines
    assert (bc, bk) == ("blue", "breakeven") and (sc, sk) == ("gray", "spot")
    assert bx == v.breakeven and sx == 100.0
    # breakeven first-leg heuristic (app.py:218-225): first long option leg
    # -> strike + total_premium/qty, total_premium = qty*prem*purchase = $2
    assert bx == pytest.approx(90.0 + 2.0)
    # analysis strings use the Persian money/percent formatters
    assert v.analysis["max_profit"] == (
        f"{format_money(v.max_profit)} ({format_percent(v.max_profit / 100.0)})")
    assert v.analysis["max_loss"].startswith(format_money(v.max_loss))
    assert v.analysis["breakeven"] == f"{v.breakeven:.2f}"


def test_payoff_view_all_loss_is_red_with_no_segments():
    legs = Legs.from_rows([(LegType.BUY_CALL, 1e9, 5.0, 1.0)])  # never ITM
    v = payoff_view(legs, 100.0, 1.0, 100.0)
    assert v.base_color == "red"
    assert v.segments == ()
    assert v.max_profit == v.max_loss  # flat -premium payoff


class _FakeResult:
    """Minimal MethodResult stand-in (duck-typed like engine.weight_search)."""

    def __init__(self, method, n=50, a=3, seed=0):
        rng = np.random.default_rng(seed)
        self.method = method
        self.std = rng.uniform(0.1, 0.5, n)
        self.ret = rng.uniform(0.0, 0.4, n)
        self.metric = rng.normal(1.0, 0.3, n)
        self.valid = rng.random(n) > 0.3
        self.valid[7] = True
        self.opt_idx = 7
        self.weights = rng.dirichlet(np.ones(a), n)

    @property
    def opt_weights(self):
        return self.weights[self.opt_idx]

    def allocations(self, investment):
        return self.opt_weights * investment


def test_frontier_view_reference_semantics():
    names = ["BTC", "ETH", "GOLD"]
    r = _FakeResult("MPT")
    v = frontier_view("MPT", r, names, risk_free=0.03, investment=10_000.0)
    # valid-only scatter, x100 (app.py:726-736)
    np.testing.assert_allclose(v.xs, r.std[r.valid] * 100)
    np.testing.assert_allclose(v.ys, r.ret[r.valid] * 100)
    np.testing.assert_allclose(v.colors, r.metric[r.valid])
    assert v.colorscale == METHODS["MPT"]["color"]
    assert v.metric_name == METHODS["MPT"]["metric"]
    # CAL: y = rf*100 + sharpe* x out to 1.3x max std% (app.py:737-746)
    assert v.cal is not None
    x, y = v.cal
    np.testing.assert_allclose(
        y, 0.03 * 100 + r.metric[r.opt_idx] * x, rtol=1e-12)
    assert x.max() == pytest.approx(r.std.max() * 1.3 * 100)
    # optimum marker
    assert v.opt_x == pytest.approx(r.std[7] * 100)
    assert v.opt_y == pytest.approx(r.ret[7] * 100)
    # allocation cards: Persian formatters over the optimum weights (761-771)
    w = r.opt_weights
    for k, (name, pct, money) in enumerate(v.cards):
        assert name == names[k]
        assert pct == format_percent(float(w[k]))
        assert money == format_money(float(w[k] * 10_000))
    np.testing.assert_allclose(v.pie_values, w * 10_000)
    assert v.pie_names == ("BTC", "ETH", "GOLD")


def test_frontier_view_non_mpt_has_no_cal_and_guards_invalid():
    r = _FakeResult("VaR")
    v = frontier_view("VaR", r, ["A", "B", "C"], 0.03, 1000.0)
    assert v.cal is None
    r.opt_idx = -1
    assert frontier_view("VaR", r, ["A", "B", "C"], 0.03, 1000.0) is None


def test_forecast_view_reference_semantics():
    class F:
        def __init__(self, price, lo, hi):
            self.price, self.conf_int = price, (lo, hi)

    forecasts = {1: F(105.5, 95.0, 116.0), 3: F(112.0, 90.0, 140.0)}
    v = forecast_view(100.0, forecasts)
    assert v.last_price == 100.0
    assert v.points == ((1, 105.5, "105.50 $"), (3, 112.0, "112.00 $"))
    assert v.ci_segments == ((1, 95.0, 116.0), (3, 90.0, 140.0))


def test_frontier_view_on_real_engine_output(fixtures_dir):
    """End-to-end: real run_simulation results flow through the view."""
    from mcport.api import load_universe
    from mcport.config import Config, DataConfig, SimulationConfig
    from mcport.engine import run_simulation

    data = load_universe(
        paths=[fixtures_dir / "BTC_USD 7 Years Weekly.csv",
               fixtures_dir / "ETH_USD 7 Years Weekly.csv"],
        config=DataConfig(period="W"))
    out = run_simulation(data, Config(simulation=SimulationConfig(n_portfolios=200)),
                         methods=("MPT", "Equal Weight"))
    for method, r in out.results.items():
        v = frontier_view(method, r, data.names, 0.03, 10_000.0)
        assert v is not None
        assert np.isfinite(v.xs).all() and np.isfinite(v.pie_values).all()
        assert abs(v.pie_values.sum() - 10_000.0) < 0.01  # f32 weight rounding
