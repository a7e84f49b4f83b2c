"""Risk-budget portfolio construction: ERC / risk parity, HRP, inverse-variance.

The reference's only constructors are random-weight search and equal weight
(app.py:671-677); these are the standard risk-based allocators a portfolio
framework is expected to ship alongside them:

- **risk_parity** — weights whose *risk contributions* match a budget vector
  (equal budgets = ERC). Solved via damped Newton on Spinu's convex potential
  f(y) = 1/2 y'Sigma y - sum b_i log y_i, whose normalized stationary point is
  exactly the risk-budget portfolio. Fixed iteration count, one (A, A) linear
  solve per step. Runs HOST-SIDE on purpose: the inputs are (A, A) with
  A <= 64, so a device dispatch (let alone an XLA compile) costs orders of
  magnitude more than the entire solve — the same judgment call as HRP below.
  Device-scale compute in this framework starts where the path dimension does.
- **hierarchical_risk_parity** — Lopez de Prado's HRP: correlation-distance
  single-linkage tree, quasi-diagonal leaf order, recursive bisection with
  inverse-variance cluster allocations. Tree building is inherently
  sequential/tiny (A <= 64), so it runs host-side on the (A, A) matrix;
  no path data ever leaves the device for this.
- **inverse_variance** — the 1/sigma_i^2 baseline HRP degenerates to on a
  diagonal covariance.

All constructors consume the same annualized covariance the reference
estimates at app.py:679-680 and return simplex weights compatible with every
mcport engine (gbm_risk, path_risk, frontier searches).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "risk_parity",
    "risk_contributions",
    "hierarchical_risk_parity",
    "inverse_variance",
]


def risk_contributions(weights, cov) -> np.ndarray:
    """Fractional risk contributions RC_i = w_i (Sigma w)_i / (w'Sigma w)."""
    w = np.asarray(weights, np.float64)
    sigma = np.asarray(cov, np.float64)
    m = sigma @ w
    tot = w @ m
    return w * m / tot if tot > 0 else np.full_like(w, 1.0 / len(w))


def _rp_newton(sigma: np.ndarray, budgets: np.ndarray, n_iter: int = 60) -> np.ndarray:
    """Damped Newton on f(y) = 1/2 y'Sy - b.log(y); w* = y*/sum(y*)."""
    vol = np.sqrt(np.clip(np.diagonal(sigma), 1e-18, None))
    y = np.sqrt(budgets) / vol                      # exact for diagonal Sigma
    for _ in range(n_iter):
        g = sigma @ y - budgets / y
        h = sigma + np.diag(budgets / (y * y))
        dy = np.linalg.solve(h, g)
        # keep iterates strictly positive: cap each coordinate's decrease
        y_new = y - dy
        y = np.where(y_new > 0.2 * y, y_new, 0.2 * y)
    return y / y.sum()


def risk_parity(
    cov: np.ndarray,
    budgets: np.ndarray | None = None,
    n_iter: int = 60,
) -> np.ndarray:
    """Risk-budget weights: RC_i proportional to ``budgets`` (default equal =
    ERC). ``cov`` must be positive definite; budgets are normalized internally.
    """
    sigma = np.asarray(cov, np.float64)
    a = sigma.shape[-1]
    if sigma.shape != (a, a):
        raise ValueError(f"cov must be square; got {sigma.shape}")
    b = np.full(a, 1.0 / a) if budgets is None else np.asarray(budgets, np.float64)
    if (b <= 0).any():
        raise ValueError("risk budgets must be strictly positive")
    b = b / b.sum()
    w = _rp_newton(sigma, b, n_iter)
    return w / w.sum()


def inverse_variance(cov: np.ndarray) -> np.ndarray:
    """w_i proportional to 1/Sigma_ii (HRP's intra-cluster allocator)."""
    iv = 1.0 / np.clip(np.diagonal(np.asarray(cov, np.float64)), 1e-18, None)
    return iv / iv.sum()


def _quasi_diag_order(corr: np.ndarray) -> list[int]:
    """Single-linkage leaf order over the correlation-distance matrix."""
    from scipy.cluster.hierarchy import leaves_list, linkage
    from scipy.spatial.distance import squareform

    d = np.sqrt(np.clip(0.5 * (1.0 - corr), 0.0, 1.0))
    np.fill_diagonal(d, 0.0)
    condensed = squareform(d, checks=False)
    return list(leaves_list(linkage(condensed, method="single")))


def hierarchical_risk_parity(cov: np.ndarray) -> np.ndarray:
    """HRP weights (Lopez de Prado 2016): cluster, quasi-diagonalize, then
    recursively split variance between adjacent halves.

    Degenerates to :func:`inverse_variance` when assets are uncorrelated and
    is permutation-equivariant (tested). Host-side: the inputs are (A, A).
    """
    sigma = np.asarray(cov, np.float64)
    a = sigma.shape[-1]
    if a == 1:
        return np.ones(1)
    vol = np.sqrt(np.clip(np.diagonal(sigma), 1e-18, None))
    corr = np.clip(sigma / np.outer(vol, vol), -1.0, 1.0)
    order = _quasi_diag_order(corr)

    def cluster_var(items: list[int]) -> float:
        sub = sigma[np.ix_(items, items)]
        w = inverse_variance(sub)
        return float(w @ sub @ w)

    weights = np.ones(a)
    stack = [order]
    while stack:
        items = stack.pop()
        if len(items) < 2:
            continue
        half = len(items) // 2
        left, right = items[:half], items[half:]
        v_l, v_r = cluster_var(left), cluster_var(right)
        alloc_l = 1.0 - v_l / (v_l + v_r) if (v_l + v_r) > 0 else 0.5
        weights[left] *= alloc_l
        weights[right] *= 1.0 - alloc_l
        stack += [left, right]
    return weights / weights.sum()
