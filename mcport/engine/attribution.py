"""Euler risk attribution: which asset owns the tail?

The reference reports only portfolio-level VaR/CVaR (app.py:258-263). Risk
management needs the decomposition: for a linear portfolio
``port = sum_i w_i r_i``, CVaR admits the exact Euler split

    CVaR = sum_i C_i,     C_i = E[w_i r_i | port <= VaR_alpha]

(each asset's average contribution in the tail states). The identity is
pointwise-exact by linearity, so the components sum to the portfolio CVaR
to float precision — pinned in tests, no approximation.

Computation is one masked reduction per asset — no sorting-based gather of
tail rows: a boolean tail mask from the VaR threshold, then
``mean(w_i r_i * mask) / mean(mask)``. That form streams (masked sums are
psum-able and chunk-accumulable like the moment sketches).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

__all__ = ["CVaRAttribution", "cvar_attribution", "simulated_cvar_attribution"]


@dataclass(frozen=True)
class CVaRAttribution:
    var: float               # portfolio VaR_alpha (k-th worst return)
    cvar: float              # portfolio CVaR_alpha (tail mean)
    contributions: np.ndarray   # (A,) Euler components, sum == cvar
    shares: np.ndarray       # (A,) contributions / cvar (sum == 1)
    n_tail: int              # tail sample count backing the estimate
    alpha: float


@jax.jit
def _attr(term: Array, w: Array, var_thresh: Array):
    port = term @ w
    mask = (port <= var_thresh).astype(term.dtype)
    n_tail = mask.sum()
    comp = (w * (term * mask[:, None]).sum(axis=0)) / jnp.maximum(n_tail, 1.0)
    return comp, port, n_tail


def cvar_attribution(terminal: Array, weights: np.ndarray,
                     alpha: float = 0.95) -> CVaRAttribution:
    """Exact Euler CVaR decomposition over an (N, A) terminal-return matrix.

    Uses the repo's top-k tail convention (k = ceil((1-alpha) N), threshold
    at the k-th worst portfolio return) so var/cvar here equal
    exact_tail_metrics on the same scenarios.
    """
    term = jnp.asarray(terminal)
    w = jnp.asarray(weights, term.dtype)
    n = term.shape[0]
    k = max(1, math.ceil((1.0 - alpha) * n))
    port = term @ w
    worst, _ = jax.lax.top_k(-port, k)
    var = -worst[-1]
    comp, port, n_tail = _attr(term, w, var)
    comp = np.asarray(comp, np.float64)
    cvar = float(comp.sum())
    return CVaRAttribution(
        var=float(var), cvar=cvar, contributions=comp,
        shares=comp / cvar if cvar != 0 else np.full_like(comp, np.nan),
        n_tail=int(n_tail), alpha=float(alpha),
    )


def simulated_cvar_attribution(
    key: Array, params, weights: np.ndarray,
    n_paths: int = 262_144, n_steps: int = 52, alpha: float = 0.95,
    dtype=jnp.float32,
) -> CVaRAttribution:
    """Attribution over simulated GBM terminal simple returns (one draw of
    the same law the risk engines integrate)."""
    from mcport.models.gbm import terminal_log_returns

    term = terminal_log_returns(
        key, jnp.asarray(params.mean_step, dtype),
        jnp.asarray(params.chol_step, dtype), n_paths, n_steps, dtype=dtype,
    )
    return cvar_attribution(jnp.exp(term) - 1.0, weights, alpha)
