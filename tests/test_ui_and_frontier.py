"""UI import gate + efficient_frontier parity function."""

import ast
import pathlib

import numpy as np
import pytest

from mcport.engine import efficient_frontier

UI_PATH = pathlib.Path(__file__).resolve().parent.parent / "mcport" / "ui" / "app.py"


def test_ui_import_gated():
    """Without streamlit/plotly the UI module raises a clear ImportError and the
    rest of the framework is untouched."""
    with pytest.raises(ImportError, match="streamlit"):
        import mcport.ui.app  # noqa: F401


def test_ui_module_parses():
    """The UI file is syntactically valid even though its deps are absent here."""
    tree = ast.parse(UI_PATH.read_text())
    # the four reference tabs are present
    src = UI_PATH.read_text()
    for label in ["آمار دارایی‌ها", "معاملات و استراتژی‌ها", "شبیه‌سازی پرتفوی", "پیش‌بینی قیمت"]:
        assert label in src
    assert isinstance(tree, ast.Module)


def test_efficient_frontier_shapes(rng):
    a = 4
    mean = rng.normal(0.05, 0.02, a)
    cov = np.cov(rng.normal(0, 0.05, (100, a)), rowvar=False, ddof=1)
    results, weights = efficient_frontier(mean, cov, points=128)
    assert results.shape == (3, 128) and weights.shape == (128, a)
    valid = ~np.isnan(results[0])
    np.testing.assert_allclose(weights[valid].sum(1), 1.0, atol=1e-5)
    # row semantics: (std, ret, ret/std) like app.py:278-282
    np.testing.assert_allclose(
        results[2, valid], results[1, valid] / results[0, valid], atol=1e-9
    )


def test_efficient_frontier_infeasible_rows_nan():
    mean = np.array([0.1, 0.1])
    cov = np.eye(2) * 0.01
    results, weights = efficient_frontier(
        mean, cov, points=32, min_weights=np.array([0.6, 0.6])  # infeasible
    )
    assert np.isnan(results[0]).all()
