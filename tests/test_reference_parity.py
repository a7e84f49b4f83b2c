"""Micro-parity pins against the reference surface (VERDICT r1 "missing" items).

Pins the rendered stats-table column list (app.py:490-494), the Persian
error-message catalog (app.py:106-150,409-422), and the computed-stat dict order
(app.py:317-334) so regressions in display parity fail loudly.
"""

from io import BytesIO

import pytest

from mcport.data.csv_loader import CsvFormatError, read_csv_file
from mcport.data.messages import MSG
from mcport.data.yf_loader import get_price_dataframe_from_yf
from mcport.stats import DISPLAY_COLUMNS, STAT_COLUMNS


def test_display_columns_match_reference_exactly():
    # the 15-column display list at /root/reference/app.py:490-494, in order
    assert DISPLAY_COLUMNS == (
        "sharpe", "sortino", "volatility_ann", "total_return_ann", "implied_vol",
        "mean_ann", "mean_month", "std_ann", "std_month", "min_ann", "min_month",
        "max_ann", "max_month", "var_95", "cvar_95",
    )
    # max_drawdown is computed (dict order of app.py:317-334) but never displayed
    assert "max_drawdown" in STAT_COLUMNS
    assert "max_drawdown" not in DISPLAY_COLUMNS
    assert set(STAT_COLUMNS) - set(DISPLAY_COLUMNS) == {"max_drawdown"}
    # computed order keeps the reference's min_ann, max_ann, min_month, max_month
    i = STAT_COLUMNS.index
    assert i("min_ann") < i("max_ann") < i("min_month") < i("max_month")


def test_csv_errors_are_reference_persian():
    with pytest.raises(CsvFormatError) as e:
        read_csv_file(BytesIO(b"a,b\n1,2\n3,4\n"))
    assert str(e.value) == MSG["no_header"] == "سطر عنوان مناسب (شامل date) یافت نشد."

    with pytest.raises(CsvFormatError) as e:
        read_csv_file(BytesIO(b"Date,Price\nx,y\nz,w\n"))
    assert str(e.value) == MSG["empty_after_coerce"]


def test_yf_errors_are_reference_persian():
    import pandas as pd

    data = pd.DataFrame(
        {("BTC", "Close"): [1.0]},
    )
    data.columns = pd.MultiIndex.from_tuples([("BTC", "Close")])
    df, err = get_price_dataframe_from_yf(data, "ETH")
    assert df is None
    assert err == MSG["yf_ticker_missing"].format(ticker="ETH")
    assert err == "نماد ETH در داده‌های دریافتی وجود ندارد."


def test_message_catalog_verbatim():
    # spot-pin the remaining strings against the reference text
    assert MSG["no_date_col"] == "ستون تاریخ با نام 'Date' یا مشابه آن یافت نشد."
    assert MSG["no_price_col"] == "ستون قیمت مناسب یافت نشد."
    assert MSG["empty_after_dropna"] == "پس از حذف داده‌های خالی، داده‌ای باقی نماند."
    assert MSG["yf_empty"] == "داده‌ای دریافت نشد!"
    assert MSG["yf_download_ok"].format(ticker="T") == "داده T با موفقیت دانلود شد."
    assert MSG["no_data_warning"].startswith("⚠️")
