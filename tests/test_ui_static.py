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


def test_report_cli_end_to_end(tmp_path):
    out = tmp_path / "r.html"
    proc = subprocess.run(
        [sys.executable, "-m", "mcport.cli", "report",
         str(FIXTURES / "BTC_USD 7 Years Weekly.csv"),
         str(FIXTURES / "ETH_USD 7 Years Weekly.csv"),
         "--period", "W", "--out", str(out), "--n-portfolios", "300",
         "--methods", "MPT", "--horizons", "1"],
        capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/tmp"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    meta = json.loads(proc.stdout)
    assert meta["report"] == str(out)
    doc = out.read_text(encoding="utf-8")
    assert len(doc) == meta["bytes"]
    assert "MPT" in doc and "<svg" in doc
