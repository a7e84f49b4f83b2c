"""Serial NumPy re-statement of the reference's hottest loop, for measured CPU
baselines (BASELINE.md: "CPU reference numbers must be measured, not cited").

This restates the per-portfolio evaluation semantics of app.py:699-717 (Dirichlet
draw → <=100 rejection retries → w·mu, sqrt(w'Σw), full historical series R·w,
percentile VaR + tail-mean CVaR) as plain NumPy, the way the reference executes it:
one portfolio at a time in Python.
"""

from __future__ import annotations

import numpy as np


def reference_weight_search(
    rets: np.ndarray,
    mean_ann: np.ndarray,
    cov_ann: np.ndarray,
    n_portfolios: int,
    risk_free: float,
    min_w: np.ndarray,
    max_w: np.ndarray,
    seed: int = 0,
    alpha: float = 0.95,
):
    """Returns (risks, returns, metrics, weights) lists — the reference's loop shape."""
    rng = np.random.default_rng(seed)
    a = mean_ann.shape[0]
    all_risks, all_returns, all_metrics, all_weights = [], [], [], []
    for _ in range(n_portfolios):
        valid = False
        for _ in range(100):
            ws = rng.dirichlet(np.ones(a))
            if np.all(ws >= min_w) and np.all(ws <= max_w):
                valid = True
                break
        if not valid:
            continue
        port_return = float(ws @ mean_ann)
        port_std = float(np.sqrt(ws @ cov_ann @ ws))
        series = rets @ ws
        sharpe = (port_return - risk_free) / port_std if port_std > 0 else 0.0
        v = np.percentile(series, (1 - alpha) * 100)
        tail = series[series <= v]
        _c = tail.mean() if len(tail) else v
        all_risks.append(port_std)
        all_returns.append(port_return)
        all_metrics.append(sharpe)
        all_weights.append(ws)
    return all_risks, all_returns, all_metrics, all_weights
