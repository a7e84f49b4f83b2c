"""Persian-locale formatter parity (app.py:72-87)."""

from mcport.utils import format_float, format_money, format_percent


def test_format_money():
    assert format_money(0) == "۰ دلار"
    assert format_money(12345.6) == "12,346 دلار"
    assert format_money(1.0) == "1 دلار"
    assert format_money(0.5) == "0٫500 دلار"       # Arabic decimal separator
    assert format_money(0.1234) == "0٫123 دلار"


def test_format_percent():
    assert format_percent(0.1234) == "12٫340%"
    assert format_percent(0) == "0٫000%"
    assert format_percent(-0.05) == "-5٫000%"


def test_format_float():
    assert format_float(1234.5678) == "1,234.568"
    assert format_float(2.0) == "2"
    assert format_float(0.000123) == "0.000123"
    assert format_float(-1.5) == "-1.5"
