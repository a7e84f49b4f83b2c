# -*- coding: utf-8 -*-
"""Static HTML report renderer over the UI view-models (no streamlit/plotly).

The reference app's four tabs (/root/reference/app.py:366-809) are rebuilt in
``mcport/ui/app.py`` behind streamlit, which is an optional dependency. This
module renders the SAME content — per-asset stats table, per-method frontier
scatter + allocation donut, forecast chart with CI whiskers — to a single
self-contained HTML file using the tested view-models (:mod:`mcport.ui.view`)
and hand-rolled SVG. It is the UI tier's dependency-free execution path:
``mcport report`` produces a real rendered artifact in any environment, and
CI drives it end-to-end (tests/test_ui_static.py) where streamlit cannot run.

The dark theme mirrors the app's CSS (app.py:16-68); titles keep the app's
Persian labels with English subtitles.
"""

from __future__ import annotations

import html
import io
from typing import Mapping, Sequence

import numpy as np

__all__ = ["render_report", "svg_scatter", "svg_donut", "svg_forecast",
           "svg_payoff"]

_BG = "#1e1e1e"
_PANEL = "#2e2e2e"
_FG = "#e0e0e0"
_ACCENT = "#4CAF50"
_COLORSCALES = {
    # 3-stop approximations of the plotly scales the app assigns per method
    "Viridis": ("#440154", "#21918c", "#fde725"),
    "Plasma": ("#0d0887", "#cc4778", "#f0f921"),
    "Inferno": ("#000004", "#bc3754", "#fcffa4"),
    "Blues": ("#f7fbff", "#6baed6", "#08306b"),
    "Greens": ("#f7fcf5", "#74c476", "#00441b"),
    "Cividis": ("#00224e", "#7d7c78", "#fee838"),
}
_PIE_COLORS = ("#4CAF50", "#2196F3", "#FFC107", "#E91E63", "#9C27B0",
               "#00BCD4", "#FF5722", "#8BC34A", "#3F51B5", "#FF9800",
               "#009688", "#F44336", "#CDDC39", "#673AB7", "#795548")


def _lerp_color(stops, t: float) -> str:
    t = min(max(float(t), 0.0), 1.0)
    seg = min(int(t * (len(stops) - 1)), len(stops) - 2)
    f = t * (len(stops) - 1) - seg
    a = tuple(int(stops[seg][i:i + 2], 16) for i in (1, 3, 5))
    b = tuple(int(stops[seg + 1][i:i + 2], 16) for i in (1, 3, 5))
    return "#%02x%02x%02x" % tuple(round(a[i] + (b[i] - a[i]) * f) for i in range(3))


def _axis(lo: float, hi: float) -> tuple[float, float, list[float]]:
    """Padded range + ~5 round ticks."""
    if not np.isfinite([lo, hi]).all() or hi <= lo:
        lo, hi = lo - 1.0, lo + 1.0
    pad = 0.06 * (hi - lo)
    lo, hi = lo - pad, hi + pad
    raw = (hi - lo) / 4
    mag = 10.0 ** np.floor(np.log10(raw))
    step = float(min((m for m in (1, 2, 2.5, 5, 10) if m * mag >= raw),
                     default=10) * mag)
    first = np.ceil(lo / step) * step
    return lo, hi, [float(t) for t in np.arange(first, hi + step / 2, step)]


class _SVG:
    """Tiny SVG builder with a data->pixel transform."""

    def __init__(self, width: int, height: int, xlo, xhi, ylo, yhi,
                 margin: int = 46):
        self.w, self.h, self.m = width, height, margin
        self.xlo, self.xhi, self.ylo, self.yhi = xlo, xhi, ylo, yhi
        self.parts = [
            f'<svg viewBox="0 0 {width} {height}" '
            f'xmlns="http://www.w3.org/2000/svg" '
            f'style="background:{_PANEL};border-radius:5px">'
        ]

    def px(self, x: float) -> float:
        return self.m + (x - self.xlo) / (self.xhi - self.xlo) * (self.w - 2 * self.m)

    def py(self, y: float) -> float:
        return self.h - self.m - (y - self.ylo) / (self.yhi - self.ylo) * (self.h - 2 * self.m)

    def axes(self, xticks, yticks, xfmt="{:.3g}", yfmt="{:.3g}"):
        a = self.parts.append
        for t in xticks:
            x = self.px(t)
            a(f'<line x1="{x:.1f}" y1="{self.m}" x2="{x:.1f}" '
              f'y2="{self.h - self.m}" stroke="#444" stroke-width="0.6"/>')
            a(f'<text x="{x:.1f}" y="{self.h - self.m + 16}" fill="#999" '
              f'font-size="10" text-anchor="middle">{xfmt.format(t)}</text>')
        for t in yticks:
            y = self.py(t)
            a(f'<line x1="{self.m}" y1="{y:.1f}" x2="{self.w - self.m}" '
              f'y2="{y:.1f}" stroke="#444" stroke-width="0.6"/>')
            a(f'<text x="{self.m - 6}" y="{y + 3:.1f}" fill="#999" '
              f'font-size="10" text-anchor="end">{yfmt.format(t)}</text>')

    def labels(self, xlabel: str, ylabel: str):
        self.parts.append(
            f'<text x="{self.w / 2}" y="{self.h - 8}" fill="{_FG}" '
            f'font-size="11" text-anchor="middle">{html.escape(xlabel)}</text>')
        self.parts.append(
            f'<text x="13" y="{self.h / 2}" fill="{_FG}" font-size="11" '
            f'text-anchor="middle" transform="rotate(-90 13 {self.h / 2})">'
            f'{html.escape(ylabel)}</text>')

    def done(self) -> str:
        return "".join(self.parts) + "</svg>"


def svg_scatter(view, width: int = 560, height: int = 380) -> str:
    """Frontier scatter: candidates colored by metric, CAL line, optimum."""
    xs, ys = np.asarray(view.xs, float), np.asarray(view.ys, float)
    if xs.size == 0:
        return "<p>no valid portfolios</p>"
    xlo, xhi, xt = _axis(float(min(xs.min(), view.opt_x)),
                         float(max(xs.max(), view.opt_x)))
    ylo, yhi, yt = _axis(float(min(ys.min(), view.opt_y)),
                         float(max(ys.max(), view.opt_y)))
    s = _SVG(width, height, xlo, xhi, ylo, yhi)
    s.axes(xt, yt)
    colors = np.asarray(view.colors, float)
    c_lo = float(np.nanmin(colors)) if colors.size else 0.0
    c_hi = float(np.nanmax(colors)) if colors.size else 1.0
    span = (c_hi - c_lo) or 1.0
    stops = _COLORSCALES.get(view.colorscale, _COLORSCALES["Viridis"])
    # subsample huge clouds so the file stays light; keep the extremes
    idx = np.arange(xs.size)
    if xs.size > 3000:
        idx = np.linspace(0, xs.size - 1, 3000).astype(int)
    for i in idx:
        col = _lerp_color(stops, (float(colors[i]) - c_lo) / span)
        s.parts.append(f'<circle cx="{s.px(xs[i]):.1f}" cy="{s.py(ys[i]):.1f}" '
                       f'r="1.8" fill="{col}" fill-opacity="0.75"/>')
    if view.cal is not None:
        cx, cy = view.cal
        pts = " ".join(f"{s.px(float(x)):.1f},{s.py(float(y)):.1f}"
                       for x, y in zip(cx, cy)
                       if xlo <= x <= xhi and ylo <= y <= yhi)
        s.parts.append(f'<polyline points="{pts}" fill="none" '
                       f'stroke="#ff7f0e" stroke-width="1.5" '
                       f'stroke-dasharray="5 3"/>')
    s.parts.append(f'<circle cx="{s.px(view.opt_x):.1f}" '
                   f'cy="{s.py(view.opt_y):.1f}" r="6" fill="none" '
                   f'stroke="red" stroke-width="2.5"/>')
    s.labels("risk (std %, annual period units)", "return (%)")
    return s.done()


def svg_payoff(view, width: int = 560, height: int = 360) -> str:
    """Strategy payoff chart (tab 1, app.py:598-650 semantics).

    Mirrors the reference figure structure: the payoff curve fills to zero in
    the base color (green iff the LAST grid payoff is >= 0, app.py:603-608);
    every adjacent pair straddling zero gets a two-point overlay segment
    colored by the sign of the right point (app.py:610-621); dashed vlines at
    the breakeven (blue) and current price (gray) span [min, max] payoff
    (app.py:622-635). The analysis text (breakeven, max profit/loss in $ and
    % of invested capital, app.py:645-650) renders below the chart from the
    view's pre-formatted lines.
    """
    grid = np.asarray(view.grid, float)
    pay = np.asarray(view.payoffs, float)
    if grid.size == 0:
        return "<p>no payoff data</p>"
    xlo, xhi, xt = _axis(float(grid.min()), float(grid.max()))
    ylo, yhi, yt = _axis(float(min(pay.min(), 0.0)), float(max(pay.max(), 0.0)))
    s = _SVG(width, height, xlo, xhi, ylo, yhi)
    s.axes(xt, yt)

    # fill-to-zero polygon in the base color (plotly fill='tozeroy')
    y0 = s.py(0.0)
    pts = " ".join(f"{s.px(x):.1f},{s.py(y):.1f}" for x, y in zip(grid, pay))
    first_x, last_x = s.px(float(grid[0])), s.px(float(grid[-1]))
    s.parts.append(f'<polygon points="{first_x:.1f},{y0:.1f} {pts} '
                   f'{last_x:.1f},{y0:.1f}" fill="{view.base_color}" '
                   f'fill-opacity="0.22" class="payoff-fill"/>')
    s.parts.append(f'<polyline points="{pts}" fill="none" '
                   f'stroke="{view.base_color}" stroke-width="2"/>')

    # zero-crossing overlay segments (sign of the RIGHT point)
    for x0, x1, ya, yb, color in view.segments:
        s.parts.append(f'<line x1="{s.px(x0):.1f}" y1="{s.py(ya):.1f}" '
                       f'x2="{s.px(x1):.1f}" y2="{s.py(yb):.1f}" '
                       f'stroke="{color}" stroke-width="3" '
                       f'class="payoff-cross"/>')

    # dashed vlines spanning [min, max] payoff: breakeven (blue) + spot (gray)
    lo_px, hi_px = s.py(float(pay.min())), s.py(float(pay.max()))
    for x, color, label_key in view.vlines:
        if not (xlo <= x <= xhi):
            continue
        xp = s.px(float(x))
        s.parts.append(f'<line x1="{xp:.1f}" y1="{lo_px:.1f}" x2="{xp:.1f}" '
                       f'y2="{hi_px:.1f}" stroke="{color}" stroke-width="1.5" '
                       f'stroke-dasharray="6 4" class="payoff-vline"/>')
        s.parts.append(f'<text x="{xp + 4:.1f}" y="{s.m + 12}" fill="{color}" '
                       f'font-size="10">{html.escape(label_key)}</text>')
    s.labels("terminal price", "payoff ($)")
    return s.done()


def svg_donut(values: Sequence[float], names: Sequence[str],
              width: int = 380, height: int = 300) -> str:
    """Dollar-allocation donut with a legend (app.py:770-783)."""
    vals = np.maximum(np.asarray(values, float), 0.0)
    total = float(vals.sum())
    if total <= 0:
        return "<p>no allocation</p>"
    cx, cy, r0, r1 = height / 2, height / 2, 52, 95
    parts = [f'<svg viewBox="0 0 {width} {height}" '
             f'xmlns="http://www.w3.org/2000/svg" '
             f'style="background:{_PANEL};border-radius:5px">']
    ang = -np.pi / 2
    for k, v in enumerate(vals):
        if v <= 0:
            continue
        frac = v / total
        a2 = ang + 2 * np.pi * frac
        large = 1 if frac > 0.5 else 0
        col = _PIE_COLORS[k % len(_PIE_COLORS)]
        if frac >= 0.999:  # full circle: two half-arcs (single arc degenerates)
            parts.append(f'<circle cx="{cx}" cy="{cy}" r="{(r0 + r1) / 2}" '
                         f'fill="none" stroke="{col}" '
                         f'stroke-width="{r1 - r0}"/>')
        else:
            p = [(cx + r1 * np.cos(ang), cy + r1 * np.sin(ang)),
                 (cx + r1 * np.cos(a2), cy + r1 * np.sin(a2)),
                 (cx + r0 * np.cos(a2), cy + r0 * np.sin(a2)),
                 (cx + r0 * np.cos(ang), cy + r0 * np.sin(ang))]
            parts.append(
                f'<path d="M {p[0][0]:.1f} {p[0][1]:.1f} '
                f'A {r1} {r1} 0 {large} 1 {p[1][0]:.1f} {p[1][1]:.1f} '
                f'L {p[2][0]:.1f} {p[2][1]:.1f} '
                f'A {r0} {r0} 0 {large} 0 {p[3][0]:.1f} {p[3][1]:.1f} Z" '
                f'fill="{col}" fill-opacity="0.9"/>')
        ang = a2
    for k, n in enumerate(names):
        y = 24 + 18 * k
        col = _PIE_COLORS[k % len(_PIE_COLORS)]
        parts.append(f'<rect x="{height + 6}" y="{y - 9}" width="10" '
                     f'height="10" fill="{col}"/>')
        pct = vals[k] / total * 100
        parts.append(f'<text x="{height + 22}" y="{y}" fill="{_FG}" '
                     f'font-size="11">{html.escape(str(n))} '
                     f'({pct:.1f}%)</text>')
    parts.append("</svg>")
    return "".join(parts)


def svg_forecast(view, width: int = 560, height: int = 320) -> str:
    """Forecast markers + dashed CI whiskers (app.py:785-809 semantics)."""
    hs = [0] + [p[0] for p in view.points]
    prices = [view.last_price] + [p[1] for p in view.points]
    los = [c[1] for c in view.ci_segments]
    his = [c[2] for c in view.ci_segments]
    ylo, yhi, yt = _axis(float(min(prices + los)), float(max(prices + his)))
    xlo, xhi, xt = _axis(-0.5, float(max(hs)) + 0.5)
    s = _SVG(width, height, xlo, xhi, ylo, yhi)
    s.axes(xt, yt, xfmt="{:.0f}")
    s.parts.append(f'<circle cx="{s.px(0):.1f}" cy="{s.py(view.last_price):.1f}" '
                   f'r="5" fill="{_ACCENT}"/>')
    s.parts.append(f'<text x="{s.px(0) + 8:.1f}" '
                   f'y="{s.py(view.last_price) - 8:.1f}" fill="{_ACCENT}" '
                   f'font-size="10">{view.last_price:.2f} $</text>')
    for (h, price, label), (_, lo, hi) in zip(view.points, view.ci_segments):
        x = s.px(h)
        s.parts.append(f'<line x1="{x:.1f}" y1="{s.py(lo):.1f}" x2="{x:.1f}" '
                       f'y2="{s.py(hi):.1f}" stroke="#2196F3" '
                       f'stroke-width="1.5" stroke-dasharray="4 3"/>')
        s.parts.append(f'<circle cx="{x:.1f}" cy="{s.py(price):.1f}" r="4" '
                       f'fill="#2196F3"/>')
        s.parts.append(f'<text x="{x + 7:.1f}" y="{s.py(price) - 7:.1f}" '
                       f'fill="{_FG}" font-size="10">'
                       f'{html.escape(label)}</text>')
    s.labels("horizon (periods)", "price")
    return s.done()


def _stats_table(stats_df) -> str:
    """Per-asset stats table (tab 0, app.py:480-520 / DISPLAY_COLUMNS)."""
    out = io.StringIO()
    out.write('<table><tr><th>asset</th>')
    for c in stats_df.columns:
        out.write(f"<th>{html.escape(str(c))}</th>")
    out.write("</tr>")
    for name, row in stats_df.iterrows():
        out.write(f"<tr><td>{html.escape(str(name))}</td>")
        for v in row:
            out.write(f"<td>{v:.4f}</td>" if isinstance(v, (int, float, np.floating))
                      else f"<td>{html.escape(str(v))}</td>")
        out.write("</tr>")
    out.write("</table>")
    return out.getvalue()


def render_report(
    stats_df,
    frontier_views: Mapping[str, object],
    forecast_views: Mapping[str, object],
    *,
    payoff_views: Mapping[str, object] | None = None,
    period_label: str = "",
    investment: float = 10_000.0,
    title: str = "mcport portfolio report",
) -> str:
    """Assemble the full self-contained HTML report.

    ``stats_df``: per-asset stats DataFrame (index = asset names).
    ``frontier_views``: method -> FrontierView (or None for no-valid).
    ``forecast_views``: asset name -> ForecastView.
    ``payoff_views``: asset name -> PayoffView for hedged assets (tab 1,
    app.py:585-653); omitted when no strategies are configured, matching the
    reference's empty tab.
    """
    out = io.StringIO()
    out.write(f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title><style>
body {{ background:{_BG}; color:{_FG}; font-family: system-ui, sans-serif;
       margin: 24px; }}
h1,h2 {{ color:{_ACCENT}; }} h2 span.fa {{ color:{_FG}; font-size: 0.7em; }}
table {{ border-collapse: collapse; font-size: 12px; }}
th,td {{ border: 1px solid #444; padding: 4px 8px; background:{_PANEL}; }}
th {{ color:{_ACCENT}; }}
.row {{ display:flex; gap:16px; flex-wrap:wrap; align-items:flex-start;
        margin: 12px 0; }}
.cards {{ display:flex; gap:8px; flex-wrap:wrap; }}
.card {{ background:{_PANEL}; border:1px solid #444; border-radius:5px;
         padding:8px 12px; font-size:12px; }}
.card b {{ color:{_ACCENT}; }}
</style></head><body>
<h1>{html.escape(title)}</h1>
<p>period: {html.escape(period_label)} · investment: {investment:,.0f} $</p>
""")
    out.write('<h2><span class="fa">📊 آمار دارایی‌ها</span> — asset statistics</h2>')
    out.write(_stats_table(stats_df))

    if payoff_views:
        out.write('<h2><span class="fa">🛡️ استراتژی‌های هجینگ</span>'
                  " — hedging strategy payoffs</h2>")
        for name, pv in payoff_views.items():
            out.write(f"<h3>{html.escape(str(name))}</h3>")
            out.write('<div class="row">')
            out.write(svg_payoff(pv))
            # analysis text (app.py:645-650): breakeven, max profit/loss
            out.write('<div class="cards payoff-analysis">')
            out.write(f'<div class="card">نقطه سر به سر (breakeven)<br>'
                      f"<b>{html.escape(pv.analysis['breakeven'])}</b></div>")
            out.write(f'<div class="card">حداکثر سود (max profit)<br>'
                      f"<b>{html.escape(pv.analysis['max_profit'])}</b></div>")
            out.write(f'<div class="card">حداکثر ضرر (max loss)<br>'
                      f"<b>{html.escape(pv.analysis['max_loss'])}</b></div>")
            out.write("</div></div>")

    out.write('<h2><span class="fa">📈 شبیه‌سازی پرتفوی</span> — simulated frontier</h2>')
    for method, view in frontier_views.items():
        out.write(f"<h3>{html.escape(method)}</h3>")
        if view is None:
            out.write("<p>no valid portfolio under the weight constraints</p>")
            continue
        out.write('<div class="row">')
        out.write(svg_scatter(view))
        out.write(svg_donut(view.pie_values, view.pie_names))
        out.write("</div>")
        out.write('<div class="cards">')
        for name, pct, money in view.cards:
            out.write(f'<div class="card">{html.escape(name)}<br>'
                      f"<b>{html.escape(pct)}</b> · {html.escape(money)}</div>")
        out.write("</div>")

    if forecast_views:
        out.write('<h2><span class="fa">🔮 پیش‌بینی قیمت</span> — price forecasts</h2>')
        out.write('<div class="row">')
        for name, view in forecast_views.items():
            out.write(f'<div><h3>{html.escape(str(name))}</h3>'
                      f"{svg_forecast(view)}</div>")
        out.write("</div>")
    out.write("</body></html>")
    return out.getvalue()
