"""GBM engine: estimation parity, distributional correctness, variance reduction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.models import (
    estimate_gbm,
    portfolio_terminal_returns,
    qmc_normals,
    simulate_log_paths,
    terminal_log_returns,
    terminal_log_returns_exact,
)


@pytest.fixture(scope="module")
def params(rng):
    a = 4
    t = 300
    # synthetic correlated price history
    chol = np.linalg.cholesky(0.02 * (0.6 * np.eye(a) + 0.4))
    rets = rng.normal(0.002, 1.0, (t, a)) @ chol.T
    prices = 100 * np.exp(np.cumsum(rets, axis=0))
    return estimate_gbm(prices)


def test_estimate_moments_parity(params, rng):
    """estimate_gbm reproduces the mean/ddof=1-cov estimator on log returns."""
    a = 3
    prices = 50 * np.exp(np.cumsum(rng.normal(0.001, 0.03, (200, a)), axis=0))
    p = estimate_gbm(prices)
    lr = np.diff(np.log(prices), axis=0)
    np.testing.assert_allclose(p.mean_step, lr.mean(0), atol=1e-12)
    np.testing.assert_allclose(
        p.chol_step @ p.chol_step.T, np.cov(lr, rowvar=False, ddof=1), atol=1e-9
    )
    np.testing.assert_allclose(p.s0, prices[-1], atol=0)


def test_terminal_matches_paths(params):
    """terminal_log_returns is exactly the last slice of simulate_log_paths
    (same keys, same draws)."""
    key = jax.random.key(0)
    kw = dict(n_paths=256, n_steps=16, dtype=jnp.float64)
    paths = simulate_log_paths(key, params.mean_step, params.chol_step, **kw)
    term = terminal_log_returns(key, params.mean_step, params.chol_step, **kw)
    np.testing.assert_allclose(np.asarray(paths[:, -1, :]), np.asarray(term), atol=1e-12)


def test_simulated_moments_match_inputs(params):
    """Sample mean/cov of simulated increments converge to the input moments."""
    n, steps = 60_000, 8
    term = terminal_log_returns(
        jax.random.key(1), params.mean_step, params.chol_step, n, steps, dtype=jnp.float64
    )
    term = np.asarray(term)
    want_mean = params.mean_step * steps
    want_cov = (params.chol_step @ params.chol_step.T) * steps
    se = np.sqrt(np.diag(want_cov) / n)
    np.testing.assert_allclose(term.mean(0), want_mean, atol=float(5 * se.max()))
    np.testing.assert_allclose(np.cov(term, rowvar=False), want_cov, rtol=0.08, atol=1e-4)


def test_exact_terminal_distribution(params):
    """Step recursion and exact single-draw sampler agree in distribution."""
    n, steps = 50_000, 32
    a = terminal_log_returns(
        jax.random.key(2), params.mean_step, params.chol_step, n, steps, dtype=jnp.float64
    )
    b = terminal_log_returns_exact(
        jax.random.key(3), params.mean_step, params.chol_step, n, steps, dtype=jnp.float64
    )
    a, b = np.asarray(a), np.asarray(b)
    se = a.std(0) / np.sqrt(n)
    np.testing.assert_allclose(a.mean(0), b.mean(0), atol=float(6 * se.max()))
    np.testing.assert_allclose(a.std(0), b.std(0), rtol=0.05)


def test_antithetic_pairs_cancel(params):
    """Antithetic halves mirror exactly: mean of (z, -z) increments equals drift."""
    n, steps = 128, 4
    term = terminal_log_returns(
        jax.random.key(4), params.mean_step, params.chol_step, n, steps,
        antithetic=True, dtype=jnp.float64,
    )
    term = np.asarray(term)
    pair_mean = 0.5 * (term[: n // 2] + term[n // 2 :])
    np.testing.assert_allclose(
        pair_mean, np.broadcast_to(params.mean_step * steps, pair_mean.shape), atol=1e-12
    )


def test_antithetic_variance_reduction(params):
    """Antithetic sampling shrinks the drift-estimator variance."""
    steps, n, reps = 4, 4096, 20
    w = np.full(params.n_assets, 1.0 / params.n_assets)
    est_plain, est_anti = [], []
    for r in range(reps):
        t1 = terminal_log_returns(
            jax.random.key(100 + r), params.mean_step, params.chol_step, n, steps,
            dtype=jnp.float64,
        )
        t2 = terminal_log_returns(
            jax.random.key(200 + r), params.mean_step, params.chol_step, n, steps,
            antithetic=True, dtype=jnp.float64,
        )
        est_plain.append(float(portfolio_terminal_returns(t1, w).mean()))
        est_anti.append(float(portfolio_terminal_returns(t2, w).mean()))
    assert np.var(est_anti) < np.var(est_plain)


def test_portfolio_terminal_returns(params):
    term = terminal_log_returns(
        jax.random.key(5), params.mean_step, params.chol_step, 64, 8, dtype=jnp.float64
    )
    w = np.array([0.5, 0.2, 0.2, 0.1])
    got = np.asarray(portfolio_terminal_returns(term, w))
    want = (np.exp(np.asarray(term)) - 1.0) @ w
    np.testing.assert_allclose(got, want, atol=1e-12)
    # batch of candidate weight vectors
    wmat = np.stack([w, np.ones(4) / 4])
    got2 = np.asarray(portfolio_terminal_returns(term, wmat))
    assert got2.shape == (64, 2)
    np.testing.assert_allclose(got2[:, 0], want, atol=1e-12)


def test_reproducible_and_key_sensitivity(params):
    kw = dict(n_paths=32, n_steps=4, dtype=jnp.float32)
    a = terminal_log_returns(jax.random.key(7), params.mean_step, params.chol_step, **kw)
    b = terminal_log_returns(jax.random.key(7), params.mean_step, params.chol_step, **kw)
    c = terminal_log_returns(jax.random.key(8), params.mean_step, params.chol_step, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


# ---- Student-t innovations (fat tails, r2) --------------------------------------

def test_t_dof_method_of_moments(rng):
    """Recover nu from synthetic t-return prices within estimator noise."""
    from mcport.models.gbm import estimate_t_dof

    nu = 8.0
    t = rng.standard_t(nu, (20_000, 2))
    z = t / np.sqrt(nu / (nu - 2))
    logret = 0.001 + 0.02 * z
    prices = np.exp(np.cumsum(np.vstack([np.zeros(2), logret]), axis=0))
    got = estimate_t_dof(prices)
    assert 5.5 < got < 12.0  # kurtosis estimator is noisy; bracket generously


def test_t_terminal_law(rng):
    """Unit-variance t shocks keep mean/cov exactly; tails get fatter."""
    import jax
    import jax.numpy as jnp

    from mcport.models.gbm import terminal_log_returns, terminal_log_returns_t

    a, n, steps, df = 2, 200_000, 4, 5.0
    m = np.array([0.001, 0.002])
    chol = np.array([[0.02, 0.0], [0.01, 0.015]])
    term_t = np.asarray(terminal_log_returns_t(
        jax.random.key(0), m, chol, df, n, steps, dtype=jnp.float64))
    term_n = np.asarray(terminal_log_returns(
        jax.random.key(0), m, chol, n, steps, dtype=jnp.float64))
    cov_true = steps * (chol @ chol.T)
    # same first/second moments within MC error
    se = np.sqrt(np.diag(cov_true) / n)
    assert np.all(np.abs(term_t.mean(0) - steps * m) < 6 * se)
    np.testing.assert_allclose(np.cov(term_t, rowvar=False), cov_true, rtol=0.05)
    # fatter tails: kurtosis above normal's, extreme quantiles wider
    zt = (term_t[:, 0] - term_t[:, 0].mean()) / term_t[:, 0].std()
    zn = (term_n[:, 0] - term_n[:, 0].mean()) / term_n[:, 0].std()
    assert np.mean(zt**4) > np.mean(zn**4) + 0.5
    assert np.quantile(zt, 0.001) < np.quantile(zn, 0.001) - 0.2


def test_t_antithetic_mirror():
    import jax
    import jax.numpy as jnp

    from mcport.models.gbm import terminal_log_returns_t

    m = np.array([0.002, 0.001])
    chol = np.diag([0.02, 0.03])
    term = np.asarray(terminal_log_returns_t(
        jax.random.key(1), m, chol, 6.0, 1_000, 6, antithetic=True,
        dtype=jnp.float64))
    drift = 6 * m
    np.testing.assert_allclose(term[:500] + term[500:],
                               np.broadcast_to(2 * drift, (500, 2)), atol=1e-12)


def test_engine_student_t_var_fatter_than_normal():
    """End-to-end: the resumable engine with student_t innovations reports a
    (weakly) worse VaR/CVaR than normal GBM at matched moments."""
    from mcport.config import GBMConfig
    from mcport.engine.mc_engine import run_resumable_mc
    from mcport.models.gbm import GBMParams

    a = 2
    params = GBMParams(s0=np.ones(a), mean_step=np.array([0.0, 0.0]),
                       chol_step=np.diag([0.03, 0.02]))
    w = np.array([0.5, 0.5])
    base = GBMConfig(n_paths=262_144, n_steps=8, path_block=16_384,
                     use_pallas=False, seed=3)
    fat = GBMConfig(n_paths=262_144, n_steps=8, path_block=16_384,
                    use_pallas=False, seed=3, innovations="student_t", t_dof=4.6)
    r_n, ck_n = run_resumable_mc(params, w, base)
    r_t, ck_t = run_resumable_mc(params, w, fat)
    # Subtlety: a UNIT-VARIANCE t has a MILDER 5% quantile than the normal
    # (mass moves to the extreme tail), so VaR95 is not the fat-tail signature —
    # the tail MEAN (CVaR) and deep quantiles are:
    assert r_t.cvar < r_n.cvar
    from mcport.ops.quantile import sketch_quantile

    v99_n = float(sketch_quantile(ck_n.hist, 0.01, ck_n.sketch))
    v99_t = float(sketch_quantile(ck_t.hist, 0.01, ck_t.sketch))
    assert v99_t < v99_n          # 99% VaR fatter under t
    # matched second moments (unit-variance t): cov agrees within MC error
    np.testing.assert_allclose(r_t.cov, r_n.cov, rtol=0.08, atol=2e-5)


def test_digest_separates_innovations(tmp_path):
    from mcport.config import GBMConfig
    from mcport.engine.mc_engine import load_checkpoint, run_resumable_mc
    from mcport.models.gbm import GBMParams

    params = GBMParams(s0=np.ones(2), mean_step=np.zeros(2),
                       chol_step=np.diag([0.02, 0.02]))
    w = np.array([0.5, 0.5])
    cfg_n = GBMConfig(n_paths=4_096, n_steps=4, path_block=1_024, use_pallas=False)
    cfg_t = GBMConfig(n_paths=4_096, n_steps=4, path_block=1_024, use_pallas=False,
                      innovations="student_t")
    path = tmp_path / "n.npz"
    run_resumable_mc(params, w, cfg_n, max_blocks=2, checkpoint_path=path)
    with pytest.raises(ValueError, match="digest"):
        run_resumable_mc(params, w, cfg_t, checkpoint=load_checkpoint(path))


def test_polar_t_quantile_parity_vs_rejection_sampler(rng):
    """Bailey polar t draws match jax.random.t through the 0.1% tails."""
    import jax
    import jax.numpy as jnp

    from mcport.models.gbm import _student_t_polar

    nu, n = 5.5, 1_000_000
    ours = np.asarray(_student_t_polar(jax.random.key(0), nu, (n,), jnp.float64))
    ref = np.asarray(jax.random.t(jax.random.key(1), nu, (n,), jnp.float64))
    assert abs(ours.var() - nu / (nu - 2)) < 0.05
    for q in (0.001, 0.01, 0.05, 0.5, 0.95, 0.99, 0.999):
        a, b = np.quantile(ours, q), np.quantile(ref, q)
        tol = 0.06 * max(abs(b), 1.0) + 0.02
        assert abs(a - b) < tol, (q, a, b)


# ---- estimator tiers: Ledoit-Wolf shrinkage + RiskMetrics EWMA -------------


def test_ledoit_wolf_shrinks_toward_identity_and_conditions():
    from mcport.models.gbm import ledoit_wolf_shrinkage

    rng = np.random.default_rng(3)
    a, t = 12, 30                      # short history, wide universe
    true_cov = 0.02**2 * (0.6 * np.eye(a) + 0.4)
    x = rng.multivariate_normal(np.zeros(a), true_cov, size=t)
    s = np.cov(x, rowvar=False, ddof=1)
    lw, rho = ledoit_wolf_shrinkage(x)
    assert 0.0 < rho < 1.0
    # shrinkage can only improve conditioning, and here it must (T=30, A=12)
    assert np.linalg.cond(lw) < np.linalg.cond(s)
    # rho=0 limit is exactly the reference's ddof=1 estimator
    np.testing.assert_allclose(
        lw, rho * np.trace(s) / a * np.eye(a) + (1 - rho) * s)
    # closer to the truth than the raw sample estimate (the LW point)
    assert (np.linalg.norm(lw - true_cov) < np.linalg.norm(s - true_cov))
    # long history → intensity collapses
    x_long = rng.multivariate_normal(np.zeros(a), true_cov, size=5000)
    _, rho_long = ledoit_wolf_shrinkage(x_long)
    assert rho_long < rho / 3


def test_ewma_cov_tracks_the_recent_regime():
    from mcport.models.gbm import ewma_cov

    rng = np.random.default_rng(5)
    calm = rng.normal(0.0, 0.01, size=(200, 2))
    stressed = rng.normal(0.0, 0.05, size=(20, 2))
    x = np.vstack([calm, stressed])
    s = np.cov(x, rowvar=False, ddof=1)
    e = ewma_cov(x, 0.94)
    # the EW estimate lives in the stress regime; the sample average doesn't
    assert e[0, 0] > 3 * s[0, 0]
    # lambda -> 1 recovers (approximately) the equal-weight sample estimator
    e1 = ewma_cov(x, 0.999999)
    np.testing.assert_allclose(e1, s, rtol=1e-3)
    with pytest.raises(ValueError, match="lambda"):
        ewma_cov(x, 1.5)


def test_estimate_gbm_estimator_tiers_wire_through():
    rng = np.random.default_rng(7)
    t, a = 60, 5
    prices = 100 * np.exp(np.cumsum(rng.normal(1e-3, 0.02, (t, a)), axis=0))
    base = estimate_gbm(prices)
    lw = estimate_gbm(prices, estimator="lw")
    ew = estimate_gbm(prices, estimator="ewma", ewma_lambda=0.9)
    # drift is estimator-independent; covariances differ
    np.testing.assert_array_equal(base.mean_step, lw.mean_step)
    np.testing.assert_array_equal(base.mean_step, ew.mean_step)
    assert not np.allclose(base.chol_step, lw.chol_step)
    assert not np.allclose(base.chol_step, ew.chol_step)
    cond = lambda p: np.linalg.cond(p.chol_step @ p.chol_step.T)
    assert cond(lw) < cond(base)
    with pytest.raises(ValueError, match="estimator"):
        estimate_gbm(prices, estimator="bogus")
