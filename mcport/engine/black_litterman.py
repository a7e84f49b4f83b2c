"""Black-Litterman posterior returns: equilibrium + investor views.

The reference estimates expected returns as raw sample means
(/root/reference/app.py:679) — famously noisy inputs that make optimizers
chase estimation error. Black-Litterman (1992) starts from the returns
IMPLIED by market-cap weights (reverse optimization) and blends in explicit
views with stated confidence:

    pi      = delta * Sigma * w_mkt                       (equilibrium)
    mu_BL   = pi + tau*Sigma*P' (P tau*Sigma P' + Omega)^{-1} (q - P pi)
    Sigma_BL= Sigma + tau*Sigma
              - tau*Sigma P' (P tau*Sigma P' + Omega)^{-1} P tau*Sigma

Host-side numpy by design (like risk_parity): the inputs are (A, A)
matrices; the downstream consumers — exact_frontier's PGD QP or the random
searches — are where the compute lives. ``posterior_frontier`` feeds the
posterior straight into the exact mean-variance frontier.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["BLPosterior", "black_litterman", "absolute_view", "relative_view",
           "implied_equilibrium_returns", "posterior_frontier"]


def implied_equilibrium_returns(cov: np.ndarray, w_mkt: np.ndarray,
                                delta: float = 2.5) -> np.ndarray:
    """Reverse optimization: the returns for which ``w_mkt`` is mean-variance
    optimal at risk aversion ``delta`` — pi = delta * Sigma * w_mkt."""
    return float(delta) * np.asarray(cov, np.float64) @ np.asarray(w_mkt, np.float64)


def absolute_view(asset: int, q: float, n_assets: int) -> tuple[np.ndarray, float]:
    """'Asset i will return q': one picking row + target."""
    p = np.zeros(n_assets)
    p[asset] = 1.0
    return p, float(q)


def relative_view(long: int, short: int, q: float,
                  n_assets: int) -> tuple[np.ndarray, float]:
    """'Asset `long` outperforms asset `short` by q': +1/-1 picking row."""
    p = np.zeros(n_assets)
    p[long], p[short] = 1.0, -1.0
    return p, float(q)


@dataclass(frozen=True)
class BLPosterior:
    mu: np.ndarray           # (A,) posterior expected returns
    cov: np.ndarray          # (A, A) posterior covariance (Sigma + M)
    pi: np.ndarray           # (A,) equilibrium returns
    tau: float
    delta: float


def black_litterman(
    cov: np.ndarray,
    w_mkt: np.ndarray,
    views_p: np.ndarray | None = None,
    views_q: np.ndarray | None = None,
    tau: float = 0.05,
    delta: float = 2.5,
    omega: np.ndarray | None = None,
) -> BLPosterior:
    """Posterior (mu, cov) from equilibrium + views.

    ``views_p`` is (K, A) picking rows, ``views_q`` (K,) targets. ``omega``
    defaults to the He-Litterman (1999) choice ``diag(P tau*Sigma P')``
    (views as uncertain as the prior on their portfolios); pass a (K, K)
    matrix — e.g. near-zero diagonals — for near-certain views. With no
    views the posterior is exactly ``(pi, (1 + tau) Sigma)``.
    """
    sigma = np.atleast_2d(np.asarray(cov, np.float64))
    w = np.asarray(w_mkt, np.float64)
    a = sigma.shape[0]
    if w.shape != (a,):
        raise ValueError(f"w_mkt must be ({a},); got {w.shape}")
    if not np.isclose(w.sum(), 1.0, atol=1e-6):
        raise ValueError("market weights must sum to 1")
    pi = implied_equilibrium_returns(sigma, w, delta)
    ts = float(tau) * sigma

    if views_p is None or len(np.atleast_2d(views_p)) == 0:
        return BLPosterior(mu=pi, cov=sigma + ts, pi=pi, tau=float(tau),
                           delta=float(delta))
    if views_q is None:
        raise ValueError("views_p given without views_q targets")

    p = np.atleast_2d(np.asarray(views_p, np.float64))
    q = np.atleast_1d(np.asarray(views_q, np.float64))
    k = p.shape[0]
    if p.shape != (k, a) or q.shape != (k,):
        raise ValueError(f"views must be P (K,{a}) and q (K,); got "
                         f"{p.shape} and {q.shape}")
    pts = p @ ts                                        # (K, A)
    mid = pts @ p.T                                     # P tau*Sigma P'
    if omega is None:
        omega = np.diag(np.diag(mid))
    omega = np.atleast_2d(np.asarray(omega, np.float64))
    gain = np.linalg.solve(mid + omega, np.eye(k))      # (P ts P' + Omega)^-1
    mu = pi + pts.T @ gain @ (q - p @ pi)
    m = ts - pts.T @ gain @ pts
    return BLPosterior(mu=mu, cov=sigma + m, pi=pi, tau=float(tau),
                       delta=float(delta))


def posterior_frontier(post: BLPosterior, min_weights=None, max_weights=None,
                       risk_free: float = 0.0, n_lambda: int = 64):
    """Exact box-constrained mean-variance frontier on the BL posterior
    (engine.frontier_opt's PGD QP over (mu_BL, Sigma_BL))."""
    from mcport.engine.frontier_opt import exact_frontier

    return exact_frontier(post.mu, post.cov, min_weights, max_weights,
                          risk_free=risk_free, n_lambda=n_lambda)
