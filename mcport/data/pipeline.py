"""Prices → returns → device-array pipeline (the pandas/JAX boundary).

Replicates the reference's data assembly exactly:

- name disambiguation via a Counter suffix "name (2)" (app.py:442-447, 466-472)
- per-asset frames inner-joined on Date (app.py:473-479)
- ``resample(rule).last().dropna()`` (app.py:482) — rules are pandas-3 spellings
  ('ME'/'QE'/'W', see :func:`mcport.config.period_info`)
- two return conventions, both used by the reference:
    * stats returns:     ``pct_change().dropna()``   (app.py:288-298, tab 0)
    * portfolio returns: ``pct_change().fillna(0)``  (app.py:666, tab 2 — keeps a
      leading all-zero row, which feeds the moment estimates; parity requires it)
- annualized moments ``mean()*ann`` / ``cov()*ann`` (app.py:679-680; pandas cov is
  ddof=1)

Everything downstream of :func:`to_arrays` is pure JAX.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np
import pandas as pd

from mcport.config import DataConfig, period_info
from mcport.data.csv_loader import read_csv_file

__all__ = [
    "dedupe_names",
    "combine_prices",
    "stats_returns",
    "portfolio_returns",
    "annualized_moments",
    "load_universe",
    "PriceData",
]


def dedupe_names(names: Iterable[str]) -> list[str]:
    """Disambiguate duplicate asset names with a " (k)" suffix (app.py:442-447)."""
    counter: Counter[str] = Counter()
    out = []
    for base in names:
        counter[base] += 1
        out.append(base if counter[base] == 1 else f"{base} ({counter[base]})")
    return out


def combine_prices(
    named_dfs: Sequence[tuple[str, pd.DataFrame]], resample_rule: str = "ME"
) -> pd.DataFrame:
    """Inner-join per-asset (Date, Price) frames and resample to period-end.

    Parity with app.py:466-482: rename Price→asset name, set Date index, inner
    join, then ``resample(rule).last().dropna()``.
    """
    names = dedupe_names([t for t, _ in named_dfs])
    df_list = []
    for name, (_, df) in zip(names, named_dfs):
        temp = df.rename(columns={"Price": name}).dropna(subset=[name])
        temp = temp.set_index("Date")
        df_list.append(temp[[name]])
    prices = pd.concat(df_list, axis=1, join="inner")
    if not isinstance(prices.index, pd.DatetimeIndex):
        prices.index = pd.to_datetime(prices.index)
    prices = prices.sort_index()
    out = prices.resample(resample_rule).last().dropna()
    if out.empty:
        # The reference would silently carry an empty frame into the stats/sim
        # tabs and crash later; fail at the boundary instead (mixing calendars,
        # e.g. weekly-dated with daily-dated files, is the usual cause).
        raise ValueError(
            "inner join of asset histories is empty after resampling - "
            "the assets share no common dates (check mixed daily/weekly files)"
        )
    return out


def stats_returns(resampled_prices: pd.DataFrame) -> pd.DataFrame:
    """Tab-0 convention: ``pct_change().dropna()`` (app.py:288-298)."""
    return resampled_prices.pct_change().dropna()


def portfolio_returns(resampled_prices: pd.DataFrame) -> pd.DataFrame:
    """Tab-2 convention: ``pct_change().fillna(0)`` per asset, then frame-level
    dropna (app.py:659-667). The leading all-zero row is intentional parity."""
    return resampled_prices.pct_change().fillna(0.0).dropna()


def annualized_moments(
    returns: pd.DataFrame, ann_factor: int
) -> tuple[np.ndarray, np.ndarray]:
    """(mean * ann, cov * ann) with pandas semantics (ddof=1 cov) — app.py:679-680."""
    mean = returns.mean().to_numpy() * ann_factor
    cov = returns.cov().to_numpy() * ann_factor
    return mean, cov


@dataclass(frozen=True)
class PriceData:
    """The fixed-shape array bundle handed to the JAX engine."""

    names: tuple[str, ...]
    prices: np.ndarray            # (T, A) resampled prices
    stats_rets: np.ndarray        # (T-1, A) pct_change().dropna()
    port_rets: np.ndarray         # (T, A) pct_change().fillna(0)
    mean_ann: np.ndarray          # (A,)  annualized mean of port_rets
    cov_ann: np.ndarray           # (A, A) annualized ddof=1 cov of port_rets
    ann_factor: int
    resample_rule: str

    @property
    def n_assets(self) -> int:
        return len(self.names)


def load_universe(
    paths: Sequence[str | Path] | None = None,
    named_dfs: Sequence[tuple[str, pd.DataFrame]] | None = None,
    config: DataConfig = DataConfig(),
    loader: str = "pandas",
) -> PriceData:
    """Load CSVs (or pre-read frames), join, resample and compute returns/moments.

    The asset name for a CSV path is the file stem up to the first '.'
    (app.py:389 uses ``file.name.split('.')[0]``). ``loader``: "pandas" (default,
    reference-semantics), "native" (C++ fast path, verified equal on fixtures),
    or "auto" (native when available).
    """
    if loader == "auto":
        from mcport.data.fast_loader import native_available

        loader = "native" if native_available() else "pandas"
    if loader == "native":
        from mcport.data.fast_loader import read_csv_file_native as _read
    elif loader == "pandas":
        _read = read_csv_file
    else:
        raise ValueError(f"unknown loader {loader!r}; expected pandas|native|auto")

    pairs: list[tuple[str, pd.DataFrame]] = []
    if paths:
        for p in paths:
            p = Path(p)
            pairs.append((p.name.split(".")[0], _read(p, config)))
    if named_dfs:
        pairs.extend(named_dfs)
    if not pairs:
        raise ValueError("no price data provided")
    rule, ann = period_info(config.period)
    resampled = combine_prices(pairs, rule)
    srets = stats_returns(resampled)
    prets = portfolio_returns(resampled)
    mean_ann, cov_ann = annualized_moments(prets, ann)
    return PriceData(
        names=tuple(dedupe_names([t for t, _ in pairs])),
        prices=resampled.to_numpy(dtype=np.float64),
        stats_rets=srets.to_numpy(dtype=np.float64),
        port_rets=prets.to_numpy(dtype=np.float64),
        mean_ann=mean_ann,
        cov_ann=cov_ann,
        ann_factor=ann,
        resample_rule=rule,
    )
