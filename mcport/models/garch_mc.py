"""CCC-GARCH(1,1) Monte Carlo: stochastic-volatility path simulation.

Model-family extension: the reference fits GARCH(1,1) only to build forecast
confidence bands (app.py:347-350); constant-vol GBM understates clustered
volatility in tail risk. This module simulates return paths under the standard
Constant-Conditional-Correlation multivariate GARCH (Bollerslev 1990):

    r_{t,a} = mu_a + eps_{t,a},   eps_t = D_t z_t,   z_t ~ N(0, R)
    D_t = diag(sigma_{t,a}),      sigma2_{t,a} = omega_a + alpha_a eps_{t-1,a}^2
                                                 + beta_a sigma2_{t-1,a}

Estimation reuses the per-asset JAX GARCH MLE (:mod:`mcport.models.garch`);
the constant correlation R is the sample correlation of standardized residuals.
Simulation is a ``lax.scan`` carrying (sigma2, eps) per path — the same
counter-addressed key discipline as the GBM engine, so it shards and resumes
identically.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from mcport.models.garch import Garch11Fit, fit_garch_11

__all__ = ["CCCGarchParams", "estimate_ccc_garch", "simulate_garch_returns",
           "garch_terminal_returns", "garch_path_stats",
           "standardized_residuals"]


@dataclass(frozen=True)
class CCCGarchParams:
    """Per-asset GARCH(1,1) + constant conditional correlation."""

    mu: np.ndarray            # (A,) per-step mean return
    omega: np.ndarray         # (A,)
    alpha: np.ndarray         # (A,)
    beta: np.ndarray          # (A,)
    corr_chol: np.ndarray     # (A, A) Cholesky of the constant correlation R
    sigma2_0: np.ndarray      # (A,) starting conditional variance (last fitted)
    eps2_0: np.ndarray        # (A,) last squared residual

    @property
    def n_assets(self) -> int:
        return self.mu.shape[-1]


def standardized_residuals(returns: np.ndarray, mu, omega, alpha,
                           beta) -> np.ndarray:
    """(T, A) GARCH-standardized residuals e_t = eps_t / sigma_t under the
    given per-asset (A,) parameter arrays — THE single implementation of the
    recursion, shared by the CCC estimator and the DCC second step (s2[0]
    seeds at the sample variance; 1e-12 floor)."""
    r = np.asarray(returns, np.float64)
    eps = r - np.asarray(mu, np.float64)
    t_len = r.shape[0]
    s2 = np.empty_like(r)
    s2[0] = r.var(axis=0)
    for t in range(1, t_len):
        s2[t] = omega + alpha * eps[t - 1] ** 2 + beta * s2[t - 1]
    return eps / np.sqrt(np.maximum(s2, 1e-12))


def estimate_ccc_garch(returns: np.ndarray, jitter: float = 1e-10) -> CCCGarchParams:
    """Fit per-asset GARCH(1,1) MLEs + the CCC correlation from a (T, A) return
    matrix (simple per-period returns, the reference's convention)."""
    r = np.asarray(returns, np.float64)
    if r.ndim != 2 or r.shape[0] < 20:
        raise ValueError("estimate_ccc_garch needs a (T>=20, A) return matrix")
    t_len, a = r.shape
    fits: list[Garch11Fit] = [fit_garch_11(r[:, i]) for i in range(a)]
    std_resid = standardized_residuals(
        r, np.array([f.mu for f in fits]), np.array([f.omega for f in fits]),
        np.array([f.alpha for f in fits]), np.array([f.beta for f in fits]))
    corr = np.corrcoef(std_resid, rowvar=False)
    corr = np.atleast_2d(corr)
    chol = np.linalg.cholesky(corr + jitter * np.eye(a))
    return CCCGarchParams(
        mu=np.array([f.mu for f in fits]),
        omega=np.array([f.omega for f in fits]),
        alpha=np.array([f.alpha for f in fits]),
        beta=np.array([f.beta for f in fits]),
        corr_chol=chol,
        sigma2_0=np.array([f.last_sigma2 for f in fits]),
        eps2_0=np.array([f.last_eps2 for f in fits]),
    )


@partial(jax.jit, static_argnames=("n_paths", "n_steps", "full_paths", "dtype"))
def _simulate(
    key: Array,
    mu, omega, alpha, beta, corr_chol_t, sigma2_0, eps2_0,
    n_paths: int, n_steps: int, full_paths: bool, dtype=jnp.float32,
    t_df: float | None = None,
):
    a = mu.shape[-1]

    def step(carry, t):
        sigma2, eps_prev2, cum = carry
        zk = jax.random.fold_in(key, t)
        if t_df is not None:
            # GARCH-t: unit-variance Student-t shocks (QMLE params stay valid —
            # Gaussian QMLE is consistent under t errors; dof fits by moments)
            from mcport.models.gbm import _student_t_polar

            raw = _student_t_polar(zk, t_df, (n_paths, a), dtype)
            raw = raw / jnp.sqrt(jnp.asarray(t_df / (t_df - 2.0), dtype))
            z = raw @ corr_chol_t
        else:
            z = jax.random.normal(zk, (n_paths, a), dtype) @ corr_chol_t  # N(0,R)
        sigma2 = omega + alpha * eps_prev2 + beta * sigma2             # (n, A)
        eps = jnp.sqrt(jnp.maximum(sigma2, 0.0)) * z
        r_t = mu + eps
        cum = cum * (1.0 + r_t)                                        # compound
        out = r_t if full_paths else jnp.zeros((0,), dtype)
        return (sigma2, eps**2, cum), out

    init = (
        jnp.broadcast_to(sigma2_0, (n_paths, a)).astype(dtype),
        jnp.broadcast_to(eps2_0, (n_paths, a)).astype(dtype),
        jnp.ones((n_paths, a), dtype),
    )
    (sigma2, _, cum), outs = jax.lax.scan(step, init, jnp.arange(n_steps))
    return cum - 1.0, (jnp.moveaxis(outs, 0, 1) if full_paths else None)


def simulate_garch_returns(
    key: Array,
    params: CCCGarchParams,
    n_paths: int,
    n_steps: int,
    full_paths: bool = False,
    dtype=jnp.float32,
    t_df: float | None = None,
):
    """Simulate CCC-GARCH returns.

    Returns ``(terminal (n_paths, A), paths (n_paths, n_steps, A) | None)`` where
    terminal is the compounded simple return over the horizon. ``t_df`` switches
    to unit-variance Student-t shocks (GARCH-t: clustered vol AND fat
    conditional tails; the Gaussian-QMLE parameter estimates remain consistent).
    """
    return _simulate(
        key,
        jnp.asarray(params.mu, dtype), jnp.asarray(params.omega, dtype),
        jnp.asarray(params.alpha, dtype), jnp.asarray(params.beta, dtype),
        jnp.asarray(params.corr_chol, dtype).T,
        jnp.asarray(params.sigma2_0, dtype), jnp.asarray(params.eps2_0, dtype),
        n_paths, n_steps, full_paths, dtype, t_df,
    )


@partial(jax.jit, static_argnames=("n_paths", "n_steps", "dtype"))
def _path_stats(
    key, mu, omega, alpha, beta, corr_chol_t, sigma2_0, eps2_0, w_t,
    n_paths: int, n_steps: int, dtype, hedge_args=None,
):
    a = mu.shape[-1]
    hedged = hedge_args is not None
    if hedged:
        s0, ht, hk, hp, hq = hedge_args
        p0 = jnp.broadcast_to(jnp.asarray(s0, dtype), (n_paths, a))
    else:
        p0 = jnp.ones((n_paths, a), dtype)
    n_cand = w_t.shape[-1]

    def step(carry, t):
        sigma2, eps_prev2, p, v, peak, dd = carry
        zk = jax.random.fold_in(key, t)
        z = jax.random.normal(zk, (n_paths, a), dtype) @ corr_chol_t
        sigma2 = omega + alpha * eps_prev2 + beta * sigma2
        eps = jnp.sqrt(jnp.maximum(sigma2, 0.0)) * z
        r_t = mu + eps
        if hedged:
            from mcport.options.hedged import hedged_step_returns

            p_new = p * (1.0 + r_t)
            r_score = hedged_step_returns(p, p_new, ht, hk, hp, hq)
            p = p_new
        else:
            r_score = r_t
        v = v * (1.0 + r_score @ w_t)                       # (n, W)
        peak = jnp.maximum(peak, v)
        dd = jnp.minimum(dd, v / peak - 1.0)
        return (sigma2, eps**2, p, v, peak, dd), None

    init = (
        jnp.broadcast_to(sigma2_0, (n_paths, a)).astype(dtype),
        jnp.broadcast_to(eps2_0, (n_paths, a)).astype(dtype),
        p0,
        jnp.ones((n_paths, n_cand), dtype),
        jnp.ones((n_paths, n_cand), dtype),
        jnp.zeros((n_paths, n_cand), dtype),
    )
    (_, _, _, v, _, dd), _ = jax.lax.scan(step, init, jnp.arange(n_steps))
    return (v - 1.0).T, dd.T


def garch_path_stats(
    key: Array,
    params: CCCGarchParams,
    weights,
    n_paths: int,
    n_steps: int,
    dtype=jnp.float32,
    hedge_args: tuple | None = None,
) -> tuple[Array, Array]:
    """(terminal returns (W, n_paths), max drawdowns (W, n_paths)) of W
    candidate portfolios over CCC-GARCH paths — the lax reference for
    :func:`mcport.ops.pallas_garch.pallas_garch_path_stats` (same model,
    independent stream).

    Candidates compound the per-period rebalanced wealth recursion
    ``V_{t+1} = V_t (1 + w'r_t)`` (the reference's historical R·w
    semantics, app.py:710, applied to simulated GARCH returns).
    ``hedge_args = (s0, type_id, strike, premium, qty)`` switches to hedged
    per-period settlement: the asset price path ``p_{t+1} = p_t (1 + r_t)``
    settles every option leg at intrinsic value each step
    (:func:`mcport.options.hedged.hedged_step_returns`)."""
    w = jnp.asarray(weights, dtype)
    if w.ndim == 1:
        w = w[None, :]
    return _path_stats(
        key,
        jnp.asarray(params.mu, dtype), jnp.asarray(params.omega, dtype),
        jnp.asarray(params.alpha, dtype), jnp.asarray(params.beta, dtype),
        jnp.asarray(params.corr_chol, dtype).T,
        jnp.asarray(params.sigma2_0, dtype), jnp.asarray(params.eps2_0, dtype),
        w.T, n_paths, n_steps, dtype, hedge_args,
    )


def garch_terminal_returns(
    key: Array, params: CCCGarchParams, n_paths: int, n_steps: int,
    dtype=jnp.float32, t_df: float | None = None
) -> Array:
    """Terminal compounded returns only — the tail-risk workhorse."""
    term, _ = simulate_garch_returns(key, params, n_paths, n_steps, False, dtype,
                                     t_df)
    return term
