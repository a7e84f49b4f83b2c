"""Persian-locale display formatters.

Parity with the reference formatters at app.py:72-87: money amounts carry the
"دلار" (dollar) suffix, sub-dollar amounts use the Arabic decimal separator "٫",
percents are scaled x100 with three decimals. ``format_float`` exists in the
reference but is never called (SURVEY.md §2 dead code) — kept for API parity.
"""

from __future__ import annotations

ARABIC_DECIMAL = "٫"
DOLLAR = "دلار"
ZERO_DOLLARS = f"۰ {DOLLAR}"


def format_money(val: float) -> str:
    """Format a dollar amount (app.py:72-78)."""
    if val == 0:
        return ZERO_DOLLARS
    if val >= 1:
        return "{:,.0f} {}".format(val, DOLLAR)
    return "{:.3f} {}".format(val, DOLLAR).replace(".", ARABIC_DECIMAL)


def format_percent(val: float) -> str:
    """Format a decimal fraction as a percent string (app.py:80-81)."""
    return "{:.3f}%".format(val * 100).replace(".", ARABIC_DECIMAL)


def format_float(val: float) -> str:
    """General float formatter (app.py:83-87; unused in the reference UI)."""
    if abs(val) >= 1:
        return "{:,.3f}".format(val).rstrip("0").rstrip(".")
    return "{:.6f}".format(val).rstrip("0").rstrip(".")
