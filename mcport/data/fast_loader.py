"""Native (C++) CSV fast path — ctypes binding over ``mcport/_native/fastcsv``.

Division of labor: Python/pandas keeps the *semantic* work it does once per file
(header sniffing, column selection — the reference's exact rules, see
:mod:`mcport.data.csv_loader`); the C++ unit does the per-row hot work (quoted
splitting, thousands stripping, date/float parsing). Output is verified equal to
the pandas loader on every bundled fixture (tests/test_fast_loader.py).

The shared library builds on demand with ``make -C mcport/_native`` (g++ is a
baked-in tool); when unavailable (no compiler), everything falls back to the
pandas loader — the fast path is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np
import pandas as pd

from mcport.config import DataConfig
from mcport.data.csv_loader import CsvFormatError, _norm, _read_raw

__all__ = ["native_available", "read_csv_file_native", "build_native"]

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "_native"
_LIB_PATH = _NATIVE_DIR / "libfastcsv.so"
_lib = None


def build_native(force: bool = False) -> bool:
    """Compile the shared library if needed. Returns availability."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)] + (["-B"] if force else []),
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build_native():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.mc_parse_csv.restype = ctypes.c_long
    lib.mc_parse_csv.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.c_long,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def _pick_columns(path: Path, config: DataConfig) -> tuple[int, int, int]:
    """(date_col, price_col, skip_rows) using the reference's selection rules
    (app.py:99-120) on just the header region — pandas reads a 6-row prefix."""
    head = _read_raw(path, nrows=config.header_scan_rows, header=None)
    header_idx = None
    for i in range(len(head)):
        row = [_norm(x) for x in head.iloc[i].tolist()]
        if any(x == "date" for x in row):
            header_idx = i
            header_row = row
            break
    if header_idx is None:
        raise CsvFormatError("no header row containing a 'date' column found")
    date_col = header_row.index("date")
    price_candidates = [
        j for j, c in enumerate(header_row) if c in config.price_priority
    ]
    if not price_candidates:
        price_candidates = [j for j in range(len(header_row)) if j != date_col]
    if not price_candidates:
        raise CsvFormatError("no usable price column found")
    return date_col, price_candidates[0], header_idx + 1


def read_csv_file_native(
    path: str | Path, config: DataConfig = DataConfig()
) -> pd.DataFrame:
    """Native-parsed equivalent of :func:`mcport.data.csv_loader.read_csv_file`.

    Raises :class:`CsvFormatError` on format problems; raises RuntimeError when
    the native library cannot be built (callers should fall back to pandas).
    """
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native fastcsv library unavailable (no compiler?)")
    path = Path(path)
    date_col, price_col, skip = _pick_columns(path, config)

    buf = path.read_bytes()
    max_rows = buf.count(b"\n") + 2
    days = np.empty(max_rows, np.int64)
    prices = np.empty(max_rows, np.float64)
    n = lib.mc_parse_csv(
        buf, len(buf), date_col, price_col, skip,
        1 if config.strip_thousands else 0,
        days.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        prices.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_rows,
    )
    if n < 0:
        raise CsvFormatError(f"native parser rejected {path.name}")
    if n == 0:
        raise CsvFormatError("no valid rows left after type coercion")
    dates = pd.to_datetime(days[:n], unit="D").astype("datetime64[us]")
    return pd.DataFrame({"Date": dates, "Price": prices[:n]})
