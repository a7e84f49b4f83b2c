"""GARCH(1,1) — JAX-native MLE + variance forecast.

The reference calls ``arch.arch_model(returns, vol='Garch', p=1, q=1)``
(app.py:347-350). The arch package is absent here, so mcport fits the standard
constant-mean normal GARCH(1,1)

    r_t = mu + eps_t,  eps_t ~ N(0, sigma2_t),
    sigma2_t = omega + alpha * eps_{t-1}^2 + beta * sigma2_{t-1}

by maximum likelihood: the variance recursion is a ``lax.scan``, the negative
log-likelihood differentiates with ``jax.grad``, and scipy L-BFGS-B optimizes the
4 parameters under positivity/stationarity bounds (host-side — forecast tier).

The h-step variance forecast matches ``garch_fit.forecast(horizon=h)`` semantics
(app.py:349-350): sigma2_{T+1} = omega + alpha eps_T^2 + beta sigma2_T, then
sigma2_{T+k} = omega + (alpha+beta) sigma2_{T+k-1}.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

__all__ = ["Garch11Fit", "fit_garch_11", "forecast_garch_variance"]

_LOG2PI = float(np.log(2.0 * np.pi))


@dataclass(frozen=True)
class Garch11Fit:
    mu: float
    omega: float
    alpha: float
    beta: float
    last_eps2: float    # eps_T^2
    last_sigma2: float  # sigma2_T
    loglik: float


def _nll(params: Array, r: Array) -> Array:
    """Negative log-likelihood; params = (mu, log_omega, logit-ish alpha, beta)."""
    mu, omega, alpha, beta = params[0], params[1], params[2], params[3]
    eps = r - mu
    s2_0 = jnp.var(r)  # standard backcast initialization

    def step(s2_prev, e_prev2_and_e2):
        e_prev2, e2 = e_prev2_and_e2
        s2 = omega + alpha * e_prev2 + beta * s2_prev
        s2 = jnp.maximum(s2, 1e-12)
        ll = -0.5 * (_LOG2PI + jnp.log(s2) + e2 / s2)
        return s2, ll

    e2 = eps**2
    _, lls = jax.lax.scan(step, s2_0, (e2[:-1], e2[1:]))
    ll0 = -0.5 * (_LOG2PI + jnp.log(s2_0) + e2[0] / s2_0)
    return -(ll0 + jnp.sum(lls))


_nll_grad = jax.jit(jax.value_and_grad(_nll))


def fit_garch_11(returns: np.ndarray) -> Garch11Fit:
    from scipy.optimize import minimize

    r = np.asarray(returns, np.float64)
    if r.size < 10:
        raise ValueError("series too short for GARCH(1,1)")
    rj = jnp.asarray(r)
    v = float(np.var(r))

    def fun(p):
        val, g = _nll_grad(jnp.asarray(p), rj)
        return float(val), np.asarray(g, np.float64)

    bounds = [
        (None, None),              # mu
        (1e-12, 10.0 * v + 1e-12), # omega
        (0.0, 0.999),              # alpha
        (0.0, 0.999),              # beta
    ]
    best = None
    for a0, b0 in ((0.05, 0.90), (0.10, 0.80), (0.02, 0.95)):
        p0 = np.array([r.mean(), v * (1 - a0 - b0), a0, b0])
        res = minimize(fun, p0, jac=True, method="L-BFGS-B", bounds=bounds)
        if best is None or res.fun < best.fun:
            best = res
    mu, omega, alpha, beta = map(float, best.x)

    # final recursion for forecast state
    eps = r - mu
    s2 = v
    for t in range(1, r.size):
        s2 = omega + alpha * eps[t - 1] ** 2 + beta * s2
    return Garch11Fit(
        mu=mu, omega=omega, alpha=alpha, beta=beta,
        last_eps2=float(eps[-1] ** 2), last_sigma2=float(s2),
        loglik=-float(best.fun),
    )


def forecast_garch_variance(fit: Garch11Fit, horizon: int) -> np.ndarray:
    """(horizon,) per-step conditional variance forecast (app.py:349-350)."""
    out = np.empty(horizon)
    s2 = fit.omega + fit.alpha * fit.last_eps2 + fit.beta * fit.last_sigma2
    for k in range(horizon):
        out[k] = s2
        s2 = fit.omega + (fit.alpha + fit.beta) * s2
    return out
