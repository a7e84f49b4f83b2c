"""Exact mean-CDaR portfolio optimization (Chekhlov-Uryasev-Zabarankin).

The reference surfaces max drawdown only as a per-asset statistic
(/root/reference/app.py:252-256); mcport's random searches already score
drawdowns path-wise (drawdown_frontier). This module adds the exact convex
counterpart — Conditional Drawdown-at-Risk over a scenario path:

    D_t(w) = max_{s<=t} (C_s·w) - C_t·w          (uncompounded drawdown)
    CDaR_beta(w) = mean of the (1-beta)T largest D_t(w)

with C = cumsum of per-period simple returns (the classic CUZ formulation:
uncompounded cumulative returns keep D_t(w) convex — a max of affine
functions minus an affine function). The Rockafellar-Uryasev reformulation

    min_{w in S, a}  a + 1/((1-beta) T) sum_t max(D_t(w) - a, 0) - lam mu.w

is solved exactly like :mod:`mcport.engine.cvar_opt`: softplus-annealed
Nesterov projected gradient over the capped simplex, vmapped over the lam
sweep, with every reported metric re-evaluated EXACTLY (lax.top_k over the
true drawdown series) so the smoothing steers the search but never the
answer. The running max inside the objective stays exact (lax.cummax;
autodiff takes the standard subgradient).

The uncompounded-sum convention matches the reference's historical series
semantics (R·w per period, app.py:710): a per-period-rebalanced portfolio's
cumulative return is the cumsum of R·w.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


__all__ = [
    "CDaRFrontier",
    "cdar_frontier",
    "exact_cdar_metrics",
    "min_cdar_exact",
    "max_return_at_cdar",
    "simulated_cdar_frontier",
]


def _dd_series(port: Array) -> Array:
    """Uncompounded drawdown series of per-period portfolio returns (..., T)."""
    cum = jnp.cumsum(port, axis=-1)
    return jax.lax.cummax(cum, axis=port.ndim - 1) - cum


def exact_cdar_metrics(returns: Array, w: Array, alpha: float
                       ) -> tuple[Array, Array]:
    """(cdar, max_dd) of the uncompounded drawdown series, both >= 0.

    ``returns`` is (T, A) per-period simple returns, ``w`` is (..., A);
    k = ceil((1-alpha) T) matches the repo's tail convention.
    """
    t_len = returns.shape[0]
    port = jnp.swapaxes(returns @ jnp.swapaxes(jnp.atleast_2d(w), -1, -2),
                        -1, -2)                     # (..., T)
    dd = _dd_series(port)
    k_tail = max(1, math.ceil((1.0 - alpha) * t_len))
    worst, _ = jax.lax.top_k(dd, k_tail)            # (..., k) largest drawdowns
    cdar = worst.mean(axis=-1)
    max_dd = worst[..., 0]
    if jnp.ndim(w) == 1:
        cdar, max_dd = cdar[0], max_dd[0]
    return cdar, max_dd


@partial(jax.jit, static_argnames=("alpha", "n_stages", "n_iter"))
def _solve_cdar_sweep(
    returns: Array,          # (T, A) per-period simple returns
    mu: Array,               # (A,) per-period mean returns
    lams: Array,             # (L,) return-seeking sweep; 0 = pure min-CDaR
    lo: Array,
    hi: Array,
    alpha: float,
    n_stages: int = 6,
    n_iter: int = 200,
) -> Array:
    """Annealed smoothed Rockafellar-Uryasev over drawdowns -> (L, A).

    Thin wrapper over :func:`mcport.engine.cvar_opt.anneal_ru_sweep` — same
    solver, loss series = uncompounded drawdowns; the curvature bound is 4x
    the cumulative-return Gram (drawdown gradients are differences of two
    rows of C) and the temperature scale carries the sqrt(T) random-walk
    growth of cumulative returns.
    """
    from mcport.engine.cvar_opt import _curvature_bound, anneal_ru_sweep

    t_len, _ = returns.shape
    cum = jnp.cumsum(returns, axis=0)
    gmax = 4.0 * _curvature_bound(cum)
    scale = jnp.maximum(jnp.std(returns) * jnp.sqrt(jnp.asarray(t_len, returns.dtype)),
                        1e-8)
    return anneal_ru_sweep(
        lambda w: _dd_series(returns @ w), mu, lams, lo, hi, alpha, t_len,
        gmax, scale, n_stages, n_iter,
    )


@dataclass(frozen=True)
class CDaRFrontier:
    """Swept box-constrained mean-CDaR frontier over a scenario path."""

    lams: np.ndarray       # (L,)
    weights: np.ndarray    # (L, A)
    ret: np.ndarray        # (L,) mean per-period return mu'w
    cdar: np.ndarray       # (L,) exact CDaR_alpha (>= 0, fraction of wealth)
    max_dd: np.ndarray     # (L,) exact worst drawdown of the series
    alpha: float

    def _pick(self, idx: int) -> tuple[np.ndarray, float, float]:
        return self.weights[idx], float(self.ret[idx]), float(self.cdar[idx])


def cdar_frontier(
    returns: np.ndarray,
    min_weights: np.ndarray | None = None,
    max_weights: np.ndarray | None = None,
    alpha: float = 0.95,
    mean_returns: np.ndarray | None = None,
    n_lambda: int = 33,
    lam_max: float | None = None,
    n_stages: int = 6,
    n_iter: int = 200,
    dtype=jnp.float32,
) -> CDaRFrontier:
    """Trace the exact mean-CDaR frontier over a (T, A) per-period return path.

    lam=0 is the global minimum-CDaR portfolio. All reported cdar/max_dd
    columns are exact top-k evaluations of the final weights; the drawdown
    convention is uncompounded cumulative returns (see module docstring).
    """
    r = np.asarray(returns, np.float64)
    if r.ndim != 2 or r.shape[0] < 4:
        raise ValueError(f"returns must be (T >= 4, A); got shape {r.shape}")
    a = r.shape[1]
    lo = np.zeros(a) if min_weights is None else np.asarray(min_weights, np.float64)
    hi = np.ones(a) if max_weights is None else np.asarray(max_weights, np.float64)
    if lo.sum() > 1.0 + 1e-9 or hi.sum() < 1.0 - 1e-9:
        raise ValueError("infeasible weight bounds: need sum(min) <= 1 <= sum(max)")
    mu = r.mean(axis=0) if mean_returns is None else np.asarray(mean_returns, np.float64)
    if lam_max is None:
        # scale-aware: drawdown subgradients live on the cumulative-return
        # scale (std * sqrt(T) random-walk growth)
        lam_max = (100.0 * max(float(r.std()) * math.sqrt(r.shape[0]), 1e-12)
                   / max(float(np.abs(mu).max()), 1e-12))
    lams = np.concatenate([[0.0], np.geomspace(lam_max / 1e4, lam_max, n_lambda - 1)])

    w = np.asarray(
        _solve_cdar_sweep(
            jnp.asarray(r, dtype), jnp.asarray(mu, dtype), jnp.asarray(lams, dtype),
            jnp.asarray(lo, dtype), jnp.asarray(hi, dtype), float(alpha),
            n_stages, n_iter,
        ),
        np.float64,
    )
    ret = w @ mu
    cdar_e, mdd_e = exact_cdar_metrics(jnp.asarray(r), jnp.asarray(w), float(alpha))
    return CDaRFrontier(
        lams=lams, weights=w, ret=ret,
        cdar=np.asarray(cdar_e, np.float64), max_dd=np.asarray(mdd_e, np.float64),
        alpha=float(alpha),
    )


def min_cdar_exact(frontier: CDaRFrontier) -> tuple[np.ndarray, float, float]:
    """(weights, ret, cdar) of the global minimum-CDaR portfolio."""
    return frontier._pick(int(np.argmin(frontier.cdar)))


def max_return_at_cdar(
    frontier: CDaRFrontier, budget: float
) -> tuple[np.ndarray, float, float]:
    """Max mean return among frontier points with CDaR <= budget (budget like
    0.20 = 20% of wealth); nearest-cdar fallback when nothing is feasible
    (target-risk semantics of weight_search)."""
    budget = abs(budget)
    feasible = frontier.cdar <= budget
    if feasible.any():
        idx = int(np.argmax(np.where(feasible, frontier.ret, -np.inf)))
    else:
        idx = int(np.argmin(np.abs(frontier.cdar - budget)))
    return frontier._pick(idx)


def simulated_cdar_frontier(
    key: Array,
    params,
    n_steps: int = 252,
    alpha: float = 0.95,
    min_weights: np.ndarray | None = None,
    max_weights: np.ndarray | None = None,
    dtype=jnp.float32,
    **kwargs,
) -> CDaRFrontier:
    """Mean-CDaR frontier over ONE simulated per-step return path (a GBM
    scenario path in the same uncompounded convention); for historical data
    pass the return matrix to :func:`cdar_frontier` directly."""
    from mcport.models.gbm import simulate_log_paths

    paths = simulate_log_paths(
        key, jnp.asarray(params.mean_step, dtype), jnp.asarray(params.chol_step, dtype),
        1, n_steps, dtype=dtype,
    )[0]                                               # (T, A) cumulative logs
    x = jnp.diff(paths, axis=0, prepend=jnp.zeros_like(paths[:1]))
    simple = jnp.exp(x) - 1.0
    return cdar_frontier(np.asarray(simple), min_weights, max_weights,
                         alpha=alpha, dtype=dtype, **kwargs)
