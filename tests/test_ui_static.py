"""Static HTML report: the UI tier's dependency-free execution path.

Drives mcport.ui.static end-to-end over real fixture data (the same
view-models the streamlit app renders — /root/reference/app.py:366-809) and
pins the report's structure: stats table, per-method frontier scatter +
allocation donut + cards, forecast charts with CI whiskers.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
FIXTURES = REPO / "fixtures"


def _views():
    from mcport.config import Config, PortfolioConfig, SimulationConfig
    from mcport.data import load_universe
    from mcport.config import DataConfig
    from mcport.engine import run_simulation
    from mcport.models import forecast_prices
    from mcport.config import ForecastConfig
    from mcport.stats import DISPLAY_COLUMNS, asset_stats_batch
    from mcport.ui.view import forecast_view, frontier_view

    d = load_universe(
        paths=[str(FIXTURES / "BTC_USD 7 Years Weekly.csv"),
               str(FIXTURES / "ETH_USD 7 Years Weekly.csv")],
        config=DataConfig(period="W"))
    stats = asset_stats_batch(d.stats_rets.T, d.ann_factor, 0.03)
    stats_df = pd.DataFrame(
        {k: np.asarray(stats[k]) for k in DISPLAY_COLUMNS}, index=list(d.names))
    cfg = Config(portfolio=PortfolioConfig(risk_free=0.03),
                 simulation=SimulationConfig(n_portfolios=400, seed=0))
    out = run_simulation(d, cfg, methods=["MPT", "CVaR"])
    fviews = {m: frontier_view(m, r, d.names, 0.03, 10_000.0)
              for m, r in out.results.items()}
    f = forecast_prices(d.prices[:, 0], ForecastConfig(horizons=(1, 3)))
    fc = {d.names[0]: forecast_view(float(d.prices[-1, 0]), f)}
    return stats_df, fviews, fc


def test_render_report_structure():
    from mcport.ui.static import render_report

    stats_df, fviews, fc = _views()
    doc = render_report(stats_df, fviews, fc, period_label="W")
    assert doc.startswith("<!doctype html>")
    # one scatter + one donut per method, one forecast chart
    assert doc.count("<svg") == 2 * len(fviews) + len(fc)
    assert doc.count("<table") == 1
    # MPT draws the CAL; optimum marker per method (red ring)
    assert "polyline" in doc
    assert doc.count('stroke="red"') == len(fviews)
    # allocation cards: one per (method, asset)
    assert doc.count('class="card"') == len(fviews) * 2
    # forecast CI whiskers are dashed segments
    assert 'stroke-dasharray="4 3"' in doc
    # self-contained: no external resources
    assert "http://" not in doc.replace("xmlns=\"http://www.w3.org/2000/svg\"", "")
    assert "<script" not in doc


def test_svg_donut_full_and_degenerate():
    from mcport.ui.static import svg_donut

    full = svg_donut([10.0, 0.0], ["a", "b"])          # one asset = full ring
    assert "<circle" in full and "<path" not in full
    two = svg_donut([6.0, 4.0], ["a", "b"])
    assert two.count("<path") == 2
    assert svg_donut([0.0], ["a"]) == "<p>no allocation</p>"


def test_svg_payoff_reference_structure():
    """Tab-1 payoff render (app.py:598-650): base fill colored by the last
    grid payoff, one overlay segment per zero crossing, dashed breakeven +
    spot vlines, analysis cards from the view's formatted lines."""
    from mcport.options import Legs, LegType
    from mcport.ui.static import render_report, svg_payoff
    from mcport.ui.view import payoff_view

    legs = Legs.from_rows([
        (LegType.BUY_ASSET, 0.0, 0.0, 1.0),
        (LegType.BUY_PUT, 90.0, 0.02, 1.0),
    ])
    v = payoff_view(legs, purchase_price=100.0, qty_asset=1.0, spot=100.0)
    svg = svg_payoff(v)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    # fill-to-zero polygon + curve in the base color (green: ends profitable)
    assert svg.count('class="payoff-fill"') == 1
    assert f'fill="{v.base_color}"' in svg and v.base_color == "green"
    # exactly one overlay per zero-crossing pair, colored per the view
    assert svg.count('class="payoff-cross"') == len(v.segments) >= 1
    for *_xy, color in v.segments:
        assert f'stroke="{color}" stroke-width="3"' in svg
    # breakeven (blue) + spot (gray) dashed vlines with labels
    assert svg.count('class="payoff-vline"') == 2
    assert 'stroke="blue"' in svg and 'stroke="gray"' in svg
    assert ">breakeven</text>" in svg and ">spot</text>" in svg

    # wired into the report between the stats and frontier sections, with the
    # three analysis cards (breakeven / max profit / max loss)
    stats_df, fviews, fc = _views()
    doc = render_report(stats_df, fviews, fc, payoff_views={"BTC": v})
    assert doc.count('class="payoff-fill"') == 1
    assert "نقطه سر به سر" in doc and "حداکثر سود" in doc and "حداکثر ضرر" in doc
    assert v.analysis["breakeven"] in doc
    assert doc.index("payoff-fill") < doc.index("simulated frontier")
    # all 4 reference tabs now render: stats table, payoff, frontier, forecast
    assert doc.count("<svg") == 1 + 2 * len(fviews) + len(fc)


def test_svg_payoff_all_loss_red_no_crossings():
    from mcport.options import Legs, LegType
    from mcport.ui.static import svg_payoff
    from mcport.ui.view import payoff_view

    legs = Legs.from_rows([(LegType.BUY_CALL, 1e9, 5.0, 1.0)])  # never ITM
    v = payoff_view(legs, 100.0, 1.0, 100.0)
    svg = svg_payoff(v)
    assert 'fill="red"' in svg
    assert 'class="payoff-cross"' not in svg
    # breakeven (1e9 + premium) is far outside the grid: only the spot vline
    assert svg.count('class="payoff-vline"') == 1


def test_report_cli_end_to_end(tmp_path):
    out = tmp_path / "r.html"
    hedge = tmp_path / "hedge.json"
    hedge.write_text(json.dumps(
        {"BTC_USD 7 Years Weekly": {"strategy": "Married Put"}}))
    proc = subprocess.run(
        [sys.executable, "-m", "mcport.cli", "report",
         str(FIXTURES / "BTC_USD 7 Years Weekly.csv"),
         str(FIXTURES / "ETH_USD 7 Years Weekly.csv"),
         "--period", "W", "--out", str(out), "--n-portfolios", "300",
         "--methods", "MPT", "--horizons", "1", "--hedge", str(hedge)],
        capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/tmp"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    meta = json.loads(proc.stdout)
    assert meta["report"] == str(out)
    assert meta["hedged_assets"] == ["BTC_USD 7 Years Weekly"]
    doc = out.read_text(encoding="utf-8")
    assert len(doc) == meta["bytes"]
    assert "MPT" in doc and "<svg" in doc
    # tab-1 payoff chart rendered for the hedged asset
    assert doc.count('class="payoff-fill"') == 1
    assert "hedging strategy payoffs" in doc
