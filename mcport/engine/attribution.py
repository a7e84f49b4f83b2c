"""Euler risk attribution: which asset owns the tail?

The reference reports only portfolio-level VaR/CVaR (app.py:258-263). Risk
management needs the decomposition: for a linear portfolio
``port = sum_i w_i r_i``, CVaR admits the exact Euler split

    CVaR = sum_i C_i,     C_i = E[w_i r_i | port in the k worst states]

(each asset's average contribution over the k = ceil((1-alpha) N) worst
outcomes — the repo's top-k tail convention, shared with
cvar_opt.exact_tail_metrics). Ties AT the threshold are weighted
fractionally ((k - #strictly-below) / #ties), the average over all tied
top-k selections — so the components sum to exact_tail_metrics' CVaR to
float precision regardless of duplicated portfolio values (pinned in
tests).

Computation is masked reductions — no sorting-based gather of tail rows:
strict-below and at-threshold masks from the VaR threshold, then masked
sums. That form streams (masked sums are psum-able and chunk-accumulable
like the moment sketches).
"""

from __future__ import annotations

import functools
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
    cvar: float              # portfolio CVaR_alpha (k-worst mean)
    contributions: np.ndarray   # (A,) Euler components, sum == cvar
    shares: np.ndarray       # (A,) contributions / cvar (sum == 1)
    n_tail: int              # k, the tail count backing the estimate
    alpha: float


@functools.partial(jax.jit, static_argnums=(2,))
def _masked_components(term: Array, w: Array, k: int):
    """(A,) Euler components over the k worst states, threshold ties
    weighted fractionally; one pass of masked reductions.

    The VaR threshold is the k-th worst element of the SAME ``port`` vector
    the masks are built from (not a threshold recomputed through a different
    contraction) — bitwise equality in the at-threshold mask is then
    guaranteed to select at least the threshold element itself, even if XLA
    accumulates an (N,A)@(A,1) matmul differently from this matvec."""
    port = term @ w
    worst, _ = jax.lax.top_k(-port, k)
    var_thresh = -worst[k - 1]
    below = (port < var_thresh).astype(term.dtype)
    at = (port == var_thresh).astype(term.dtype)
    k = jnp.asarray(k, term.dtype)
    m = below.sum()
    t = jnp.maximum(at.sum(), 1.0)
    frac = (k - m) / t                                   # in [0, 1]
    weighted = below + frac * at                         # (N,)
    return (w * (term * weighted[:, None]).sum(axis=0)) / k


def cvar_attribution(terminal: Array, weights: np.ndarray,
                     alpha: float = 0.95) -> CVaRAttribution:
    """Exact Euler CVaR decomposition over an (N, A) terminal-return matrix.

    ``var``/``cvar`` equal :func:`mcport.engine.cvar_opt.exact_tail_metrics`
    on the same scenarios (k-th worst order statistic; k-worst mean) — the
    fractional tie weighting makes this hold even with duplicated portfolio
    values, where a hard ``port <= var`` mask would average over more than k
    states.
    """
    from mcport.engine.cvar_opt import exact_tail_metrics

    term = jnp.asarray(terminal)
    w = jnp.asarray(weights, term.dtype)
    n = term.shape[0]
    k = max(1, math.ceil((1.0 - alpha) * n))
    var, _ = exact_tail_metrics(term, w, alpha)
    comp = np.asarray(_masked_components(term, w, k), np.float64)
    cvar = float(comp.sum())
    return CVaRAttribution(
        var=float(var), cvar=cvar, contributions=comp,
        shares=comp / cvar if cvar != 0 else np.full_like(comp, np.nan),
        n_tail=k, alpha=float(alpha),
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
