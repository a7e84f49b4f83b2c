"""Pathwise sensitivities (mcport/engine/greeks.py): AD through the simulation.

Validation strategy, strongest-first:
- Euler homogeneity identities (exact in exact arithmetic — float-gap pinned)
- consistency with the independently-computed Euler attribution components
- Black-Scholes closed-form delta for a European call under drifted GBM
- central finite differences on the smooth (mean) metrics
- structural zeros (unhedged delta is identically 0 by construction)
"""

import math

import numpy as np
import pytest

from mcport.config import GBMConfig
from mcport.engine.greeks import (
    HedgedSensitivities, hedged_sensitivities, portfolio_sensitivities,
)
from mcport.models.gbm import GBMParams
from mcport.options.hedged import HedgeSpec

pytestmark = []


def _params(a=3, seed=7, vol=0.03, drift=2e-3):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(a, a))
    corr = q @ q.T
    d = np.sqrt(np.diag(corr))
    corr = corr / np.outer(d, d)
    chol = np.linalg.cholesky(corr) * vol
    mu = np.full(a, drift) + rng.normal(scale=5e-4, size=a)
    return GBMParams(mean_step=mu, chol_step=chol,
                     s0=np.full(a, 100.0))


CFG = GBMConfig(n_paths=16_384, n_steps=16, seed=3)


def test_euler_identities_and_shapes():
    params = _params()
    w = np.array([0.5, 0.3, 0.2])
    out = portfolio_sensitivities(params, w, CFG, alpha=0.95)
    for g in (out.d_mean_dw, out.d_var_dw, out.d_cvar_dw,
              out.d_mean_dmu, out.d_var_dmu, out.d_cvar_dmu,
              out.d_mean_dvol, out.d_var_dvol, out.d_cvar_dvol):
        assert g.shape == (3,) and np.isfinite(g).all()
    # positive homogeneity: w·∇_w metric == metric, to float precision
    assert out.euler_gap_var < 5e-5 * max(1.0, abs(out.var))
    assert out.euler_gap_cvar < 5e-5 * max(1.0, abs(out.cvar))
    # mean gradient is the column mean of gross returns — matches the value
    assert math.isclose(float(w @ out.d_mean_dw), out.mean, rel_tol=1e-4,
                        abs_tol=1e-6)
    # more vol should hurt the tail: CVaR falls as any asset's vol rises
    assert (out.d_cvar_dvol < 0).all()
    # more drift helps every metric
    assert (out.d_mean_dmu > 0).all()
    assert (out.d_cvar_dmu > 0).all()


def test_cvar_gradient_matches_euler_attribution():
    """w_i · ∂CVaR/∂w_i are exactly the Euler attribution components
    (independently computed by engine.attribution via masked reductions)."""
    from mcport.engine.attribution import cvar_attribution
    from mcport.engine.greeks import _terminal_log

    import jax.numpy as jnp

    params = _params()
    w = np.array([0.5, 0.3, 0.2])
    out = portfolio_sensitivities(params, w, CFG, alpha=0.95)
    term_log = _terminal_log(CFG, jnp.asarray(params.mean_step, jnp.float32),
                             jnp.asarray(params.chol_step, jnp.float32))
    att = cvar_attribution(jnp.exp(term_log) - 1.0, w, alpha=0.95)
    np.testing.assert_allclose(w * out.d_cvar_dw, att.contributions,
                               rtol=2e-4, atol=1e-7)
    assert math.isclose(out.cvar, att.cvar, rel_tol=1e-5, abs_tol=1e-7)
    assert math.isclose(out.var, att.var, rel_tol=1e-5, abs_tol=1e-7)


def test_mean_vol_gradient_matches_finite_differences():
    """Central FD on the smooth metric (mean) w.r.t. a relative vol bump of
    asset 0 — same draws on both sides (same seed), so the difference is
    pure curvature + f32 noise."""
    params = _params()
    w = np.array([0.5, 0.3, 0.2])
    out = portfolio_sensitivities(params, w, CFG, alpha=0.95)
    h = 0.02

    def mean_at(scale0):
        scale = np.ones(3)
        scale[0] = scale0
        bumped = GBMParams(mean_step=params.mean_step,
                           chol_step=params.chol_step * scale[:, None],
                           s0=params.s0)
        return portfolio_sensitivities(bumped, w, CFG, alpha=0.95).mean

    fd = (mean_at(1.0 + h) - mean_at(1.0 - h)) / (2 * h)
    np.testing.assert_allclose(out.d_mean_dvol[0], fd, rtol=5e-2,
                               atol=5e-6)


def test_unhedged_asset_delta_is_zero():
    """A plain asset's return (S_T/s0 − 1) does not depend on s0 — the
    pathwise delta of an unhedged asset is 0 up to f32 rounding of the
    (s0·e^x − s0)/s0 cancellation, while the hedged metrics reduce to the
    unhedged ones when no legs are configured."""
    params = _params()
    w = np.array([0.5, 0.3, 0.2])
    spec = HedgeSpec.build(None, names=["A", "B", "C"])
    out = hedged_sensitivities(params, w, spec, s0=np.array([100., 50., 20.]),
                               config=CFG, alpha=0.95)
    plain = portfolio_sensitivities(params, w, CFG, alpha=0.95)
    np.testing.assert_allclose(out.d_mean_ds0, 0.0, atol=1e-7)
    np.testing.assert_allclose(out.d_cvar_ds0, 0.0, atol=1e-7)
    assert math.isclose(out.base.mean, plain.mean, rel_tol=1e-6, abs_tol=1e-9)
    assert math.isclose(out.base.cvar, plain.cvar, rel_tol=1e-6, abs_tol=1e-9)


def test_call_delta_matches_black_scholes_closed_form():
    """One asset, one bought call settling at the horizon: the pathwise
    delta of the mean hedged return must match the closed form under the
    DRIFTED measure. With S_T = s0·e^X, X ~ N(m, v):

        mean = (C(s0) − p)/s0,   C = s0·e^{m+v/2}·N(d1) − K·N(d2)
        ∂mean/∂s0 = C'(s0)/s0 − (C − p)/s0²,   C' = e^{m+v/2}·N(d1)

    d1 = (ln(s0/K) + m + v)/√v, d2 = d1 − √v. (Reference leg semantics
    app.py:164-180: payoff max(S−K,0) − p, normalized by the entry price.)"""
    from scipy.stats import norm

    vol, drift, steps = 0.04, 1e-3, 16
    params = GBMParams(mean_step=np.array([drift]),
                       chol_step=np.array([[vol]]), s0=np.array([100.0]))
    s0, strike, prem = 100.0, 105.0, 3.0
    spec = HedgeSpec.build({0: [("buy_call", strike, prem, 1.0)]},
                           names=["A"])
    cfg = GBMConfig(n_paths=262_144, n_steps=steps, seed=11, antithetic=True)
    out = hedged_sensitivities(params, np.array([1.0]), spec,
                               s0=np.array([s0]), config=cfg, alpha=0.95)

    m, v = steps * drift, steps * vol**2
    d1 = (math.log(s0 / strike) + m + v) / math.sqrt(v)
    d2 = d1 - math.sqrt(v)
    growth = math.exp(m + v / 2.0)
    c = s0 * growth * norm.cdf(d1) - strike * norm.cdf(d2)
    c_prime = growth * norm.cdf(d1)
    mean_exact = (c - prem) / s0
    delta_exact = c_prime / s0 - (c - prem) / s0**2

    assert math.isclose(out.base.mean, mean_exact, rel_tol=2e-2)
    assert math.isclose(float(out.d_mean_ds0[0]), delta_exact, rel_tol=2e-2)


def test_student_t_innovations_gradients_finite():
    params = _params()
    w = np.array([0.4, 0.4, 0.2])
    cfg = GBMConfig(n_paths=8_192, n_steps=8, seed=5,
                    innovations="student_t", t_dof=6.0)
    out = portfolio_sensitivities(params, w, cfg, alpha=0.95)
    assert np.isfinite(out.d_cvar_dw).all()
    assert out.euler_gap_cvar < 5e-5 * max(1.0, abs(out.cvar))
    assert (out.d_cvar_dvol < 0).all()


def test_sharded_sensitivities_exact_host_replay(eight_devices):
    """Mesh Greeks == host replay of the per-device streams: simulate each
    device's counter-addressed shard on one host, concatenate, differentiate
    — gradients and metrics must match the 8-device shard_map run (the
    all_gather/psum transposes introduce no reduction drift)."""
    import jax
    import jax.numpy as jnp

    from mcport.engine.greeks import _metrics, terminal_log_remat
    from mcport.parallel import make_mesh
    from mcport.parallel.sharded_greeks import sharded_sensitivities
    from mcport.seeding import SEED_STRIDE

    params = _params()
    w = np.array([0.5, 0.3, 0.2])
    n_paths, n_steps, seed, alpha = 4096, 8, 11, 0.95
    mesh = make_mesh(eight_devices)
    out = sharded_sensitivities(seed, params, w, n_paths, n_steps, mesh,
                                alpha=alpha)
    assert out.euler_gap_cvar < 5e-5 * max(1.0, abs(out.cvar))

    mu = jnp.asarray(params.mean_step, jnp.float32)
    chol = jnp.asarray(params.chol_step, jnp.float32)
    n_local = n_paths // 8
    k = math.ceil((1 - alpha) * n_paths)

    def host_metrics(w_, mu_, vol_scale):
        shards = [
            terminal_log_remat(
                jax.random.fold_in(jax.random.PRNGKey(0),
                                   seed + d * SEED_STRIDE),
                mu_, vol_scale[:, None] * chol, n_local, n_steps)
            for d in range(8)
        ]
        port = jnp.concatenate([jnp.expm1(t) @ w_ for t in shards])
        return _metrics(port, k)

    import jax as _jax
    w_j = jnp.asarray(w, jnp.float32)
    ones = jnp.ones(3, jnp.float32)
    vals = np.asarray(host_metrics(w_j, mu, ones), np.float64)
    jac = _jax.jacrev(host_metrics, argnums=(0, 1, 2))(w_j, mu, ones)
    np.testing.assert_allclose([out.mean, out.var, out.cvar], vals,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(out.d_cvar_dw, np.asarray(jac[0])[2],
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(out.d_cvar_dmu, np.asarray(jac[1])[2],
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(out.d_cvar_dvol, np.asarray(jac[2])[2],
                               rtol=1e-5, atol=1e-8)


def test_qmc_greeks_match_closed_form_mean_gradient():
    """Sobol terminal draws: ∂mean/∂mu_j has the closed form
    w_j · n · exp(n·mu_j + n·Sigma_jj/2) (lognormal moment). QMC at 8k paths
    must land well inside MC error — the variance-reduction point."""
    params = _params(vol=0.02, drift=1e-3)
    w = np.array([0.5, 0.3, 0.2])
    n_steps = 16
    cfg = GBMConfig(n_paths=8_192, n_steps=n_steps, seed=4, qmc="sobol")
    out = portfolio_sensitivities(params, w, cfg, alpha=0.95)
    cov = params.chol_step @ params.chol_step.T
    exact = w * n_steps * np.exp(
        n_steps * params.mean_step + n_steps * np.diag(cov) / 2.0)
    np.testing.assert_allclose(out.d_mean_dmu, exact, rtol=2e-3)
    # Euler diagnostics hold under QMC too
    assert out.euler_gap_cvar < 5e-5 * max(1.0, abs(out.cvar))

    with pytest.raises(ValueError, match="Gaussian terminals"):
        portfolio_sensitivities(
            params, w,
            GBMConfig(n_paths=1024, n_steps=4, qmc="sobol",
                      innovations="student_t"))
    with pytest.raises(ValueError, match="antithetic"):
        portfolio_sensitivities(
            params, w,
            GBMConfig(n_paths=1024, n_steps=4, qmc="sobol", antithetic=True))


def test_call_gamma_matches_black_scholes_closed_form():
    """LR gamma of the mean hedged return vs the closed form. With
    C(s0) = s0·G·N(d1) − K·N(d2), G = e^{m+v/2}, C' = G·N(d1),
    C'' = G·φ(d1)/(s0·√v), the mean return (C − p)/s0 has

        gamma = C''/s0 − 2·C'/s0² + 2·(C − p)/s0³.

    Also pins the structural zero: the UNHEDGED asset's gamma comes out
    exactly 0 via the control variate (not zero-in-expectation)."""
    from scipy.stats import norm

    from mcport.engine.greeks import hedged_mean_gamma

    vol, drift, steps = 0.04, 1e-3, 16
    params = GBMParams(mean_step=np.array([drift, drift]),
                       chol_step=np.diag([vol, 1.5 * vol]),
                       s0=np.array([100.0, 50.0]))
    s0, strike, prem = 100.0, 105.0, 3.0
    spec = HedgeSpec.build({0: [("buy_call", strike, prem, 1.0)]},
                           names=["A", "B"])
    cfg = GBMConfig(n_paths=262_144, n_steps=steps, seed=9, antithetic=True)
    w = np.array([1.0, 1.0])
    gamma, se = hedged_mean_gamma(params, w, spec, np.array([s0, 50.0]), cfg)

    m, v = steps * drift, steps * vol**2
    d1 = (math.log(s0 / strike) + m + v) / math.sqrt(v)
    d2 = d1 - math.sqrt(v)
    growth = math.exp(m + v / 2.0)
    c = s0 * growth * norm.cdf(d1) - strike * norm.cdf(d2)
    c_p = growth * norm.cdf(d1)
    c_pp = growth * norm.pdf(d1) / (s0 * math.sqrt(v))
    gamma_exact = c_pp / s0 - 2 * c_p / s0**2 + 2 * (c - prem) / s0**3

    assert abs(gamma[0] - gamma_exact) < max(4 * se[0], 0.05 * abs(gamma_exact))
    # unhedged asset: structurally zero (control variate cancels exactly,
    # up to f32 rounding of the (s0·e^x − s0)/s0 vs expm1 cancellation)
    assert abs(gamma[1]) < 1e-8


def test_gamma_consistent_with_fd_of_pathwise_delta():
    """Central FD of the (valid, pathwise) AD delta under common random
    numbers is an independent gamma estimate — LR and FD must agree."""
    from mcport.engine.greeks import hedged_mean_gamma

    vol, drift, steps = 0.05, 0.0, 8
    params = GBMParams(mean_step=np.array([drift]),
                       chol_step=np.array([[vol]]), s0=np.array([100.0]))
    spec = HedgeSpec.build({0: [("buy_put", 95.0, 2.0, 1.0)]}, names=["A"])
    cfg = GBMConfig(n_paths=131_072, n_steps=steps, seed=13, antithetic=True)
    w = np.array([1.0])
    gamma, se = hedged_mean_gamma(params, w, spec, np.array([100.0]), cfg)

    h = 2.0
    d_up = hedged_sensitivities(params, w, spec, np.array([100.0 + h]),
                                cfg).d_mean_ds0[0]
    d_dn = hedged_sensitivities(params, w, spec, np.array([100.0 - h]),
                                cfg).d_mean_ds0[0]
    fd = (d_up - d_dn) / (2 * h)
    assert abs(gamma[0] - fd) < max(4 * se[0], 0.10 * abs(fd))
