"""CSV ingestion with the reference loader's exact semantics (app.py:89-134).

Behavioral parity with ``read_csv_file``:

1. Read with the default header; if no column is literally named (case/space-
   insensitively) ``date``, re-read headerless and scan the first 5 rows for a cell
   equal to ``date`` to use as the header row (app.py:99-109).
2. The date column is the first whose stripped-lowercase name == 'date' (app.py:111).
3. Price candidates are columns named price/close/adj close/open **in column order**
   (the reference takes ``price_candidates[0]``, i.e. the first matching column as
   laid out in the file, not a fixed priority ranking — app.py:115-120); when none
   match, every non-date column is a candidate.
4. Keep (date, price) only, drop NA rows, rename to Date/Price, coerce types, drop
   rows that fail coercion (app.py:121-130).

**Documented divergence (fix):** the reference feeds raw strings to
``pd.to_numeric(errors='coerce')`` (app.py:127), which nulls every price containing
a thousands separator — its own bundled investing.com CSVs (e.g. ``"86,493.0"``)
lose most rows ≥ 1,000 (SURVEY.md §2 "comma-price data loss"). mcport strips
thousands separators before coercion (``DataConfig.strip_thousands``, on by default;
set False for bug-compatible behavior).

Errors are raised as :class:`CsvFormatError` carrying the same failure conditions the
reference reports via ``st.error`` (app.py:132-134); ``try_read_csv_file`` gives the
(df | None, err | None) form used at UI boundaries.
"""

from __future__ import annotations

import os
from typing import IO, Union

import pandas as pd

from mcport.config import DataConfig
from mcport.data.messages import MSG

__all__ = ["CsvFormatError", "read_csv_file", "try_read_csv_file"]

FileLike = Union[str, os.PathLike, IO[bytes], IO[str]]


class CsvFormatError(ValueError):
    """A CSV could not be normalized to a (Date, Price) frame.

    Mirrors the recoverable ingestion errors of app.py:106,113,119,123,130 with the
    reference's exact Persian messages (:mod:`mcport.data.messages`) — callers
    should skip the asset and continue (SURVEY.md §5 failure-detection semantics).
    """


def _read_raw(file: FileLike, **kwargs) -> pd.DataFrame:
    if hasattr(file, "seek"):
        file.seek(0)  # the reference rewinds before each read (app.py:91,97)
    return pd.read_csv(file, **kwargs)


def _norm(name: object) -> str:
    return str(name).strip().lower()


def read_csv_file(file: FileLike, config: DataConfig = DataConfig()) -> pd.DataFrame:
    """Normalize an uploaded CSV into a ``DataFrame[Date, Price]``.

    Raises :class:`CsvFormatError` on any unrecoverable format problem.
    """
    df_try = _read_raw(file)
    if any(_norm(c) == "date" for c in df_try.columns):
        df = df_try.copy()
    else:
        df = _read_raw(file, header=None)
        header_idx = None
        for i in range(min(config.header_scan_rows, len(df))):
            row = [_norm(x) for x in df.iloc[i].tolist()]
            if any(x == "date" for x in row):
                header_idx = i
                break
        if header_idx is None:
            raise CsvFormatError(MSG["no_header"])
        header_row = df.iloc[header_idx].tolist()
        df = df.iloc[header_idx + 1 :].reset_index(drop=True)
        df.columns = header_row

    date_cols = [c for c in df.columns if _norm(c) == "date"]
    if not date_cols:
        raise CsvFormatError(MSG["no_date_col"])
    date_col = date_cols[0]

    # First matching column in file order, exactly like app.py:115-120.
    price_candidates = [c for c in df.columns if _norm(c) in config.price_priority]
    if not price_candidates:
        price_candidates = [c for c in df.columns if c != date_col]
    if not price_candidates:
        raise CsvFormatError(MSG["no_price_col"])
    price_col = price_candidates[0]

    df = df[[date_col, price_col]].dropna()
    if df.empty:
        raise CsvFormatError(MSG["empty_after_dropna"])

    df = df.rename(columns={date_col: "Date", price_col: "Price"})
    df["Date"] = pd.to_datetime(df["Date"], errors="coerce", format="mixed")
    price = df["Price"]
    if config.strip_thousands and not pd.api.types.is_numeric_dtype(price):
        price = price.astype(str).str.replace(",", "", regex=False)
    df["Price"] = pd.to_numeric(price, errors="coerce")
    df = df.dropna(subset=["Date", "Price"])
    if df.empty:
        raise CsvFormatError(MSG["empty_after_coerce"])
    return df.reset_index(drop=True)


def try_read_csv_file(
    file: FileLike, config: DataConfig = DataConfig()
) -> tuple[pd.DataFrame | None, str | None]:
    """Non-raising variant returning (df, None) or (None, error message)."""
    try:
        return read_csv_file(file, config), None
    except (CsvFormatError, Exception) as e:  # the reference catches everything
        return None, str(e)
