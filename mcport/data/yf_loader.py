"""yfinance price extraction (app.py:136-162, 404-422).

``get_price_dataframe_from_yf`` is a pure function over an already-downloaded frame
and carries the reference's exact semantics: MultiIndex (multi-ticker) vs flat
columns, price priority Close > Adj Close > Open, ``(df, err)`` result shape, and
the reference's Persian error messages verbatim (app.py:146,150; see
:mod:`mcport.data.messages`).

``download_prices`` is the network boundary (app.py:407). yfinance is not part of
this environment (and the build environment has zero egress), so the import is
lazy and failure is reported the same way the reference reports download errors —
as a recoverable per-ticker error, never a crash.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from mcport.data.messages import MSG

__all__ = ["get_price_dataframe_from_yf", "download_prices"]


def get_price_dataframe_from_yf(
    data: pd.DataFrame, t: str
) -> tuple[pd.DataFrame | None, str | None]:
    """Extract a (Date, Price) frame for ticker ``t`` from a yf.download result.

    Parity with app.py:136-162, including the (df, err) contract.
    """
    price_priority = ["Close", "Adj Close", "Open"]
    if isinstance(data.columns, pd.MultiIndex):
        if t in data.columns.levels[0]:
            df_t = data[t].reset_index()
            price_col = next((c for c in price_priority if c in df_t.columns), None)
            if price_col is None:
                return None, MSG["yf_no_price_col"].format(ticker=t)
            df = df_t[["Date", price_col]].rename(columns={price_col: "Price"})
            return df, None
        return None, MSG["yf_ticker_missing"].format(ticker=t)
    if "Date" not in data.columns:
        data = data.reset_index()
    price_col = next((c for c in price_priority if c in data.columns), None)
    if price_col is None:
        return None, MSG["yf_no_price_col"].format(ticker=t)
    df = data[["Date", price_col]].rename(columns={price_col: "Price"})
    return df, None


def download_prices(
    tickers: Iterable[str], start=None, end=None
) -> list[tuple[str, pd.DataFrame | None, str | None]]:
    """Download tickers via yfinance, mirroring the driver at app.py:404-422.

    Returns [(ticker, df | None, err | None)] — per-ticker errors are recoverable,
    matching the reference's skip-with-message semantics.
    """
    tickers = [t.strip() for t in tickers if t and t.strip()]
    try:
        import yfinance as yf  # lazy: not installed in the build environment
    except ImportError:
        return [(t, None, MSG["yf_download_error"].format(error="yfinance is not installed")) for t in tickers]
    try:
        data = yf.download(
            tickers, start=start, end=end, progress=False, group_by="ticker", auto_adjust=True
        )
    except Exception as ex:  # network errors are recoverable (app.py:421-422)
        return [(t, None, MSG["yf_download_error"].format(error=ex)) for t in tickers]
    if data is None or data.empty:
        return [(t, None, MSG["yf_empty"]) for t in tickers]
    out = []
    for t in tickers:
        df, err = get_price_dataframe_from_yf(data, t)
        if df is not None:
            df["Date"] = pd.to_datetime(df["Date"])
        out.append((t, df, err))
    return out
