"""Quantile sketch + streaming moments + QMC point-set tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.config import SketchConfig
from mcport.models.qmc import halton, qmc_normals, sobol
from mcport.ops.quantile import (
    finalize_moments,
    histogram,
    init_moments,
    merge_moments,
    sketch_quantile,
    sketch_tail_mean,
    sketch_var_cvar,
    update_moments,
)

CFG = SketchConfig(n_bins=8192, lo=-1.0, hi=3.0)
BIN_W = (CFG.hi - CFG.lo) / CFG.n_bins


def test_streaming_moments_exact(rng):
    x = rng.normal(0.1, 0.5, (1000, 3))
    state = init_moments(3, jnp.float64)
    for chunk in np.split(x, 10):
        state = update_moments(state, chunk)
    mean, cov = finalize_moments(state)
    np.testing.assert_allclose(np.asarray(mean), x.mean(0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(cov), np.cov(x, rowvar=False, ddof=1), atol=1e-10)


def test_moments_merge_associative(rng):
    x = rng.normal(0, 1, (600, 2))
    a = update_moments(init_moments(2, jnp.float64), x[:200])
    b = update_moments(init_moments(2, jnp.float64), x[200:])
    whole = update_moments(init_moments(2, jnp.float64), x)
    merged = merge_moments(a, b)
    m1, c1 = finalize_moments(merged)
    m2, c2 = finalize_moments(whole)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-10)


def test_sketch_quantile_vs_percentile(rng):
    x = rng.normal(0.05, 0.3, 200_000)
    counts = histogram(x, CFG)
    for q in (0.01, 0.05, 0.5, 0.95):
        got = float(sketch_quantile(counts, q, CFG))
        want = np.percentile(x, q * 100)
        assert abs(got - want) <= 2 * BIN_W, (q, got, want)


def test_sketch_var_cvar_vs_exact(rng):
    x = rng.standard_t(4, 500_000) * 0.1
    counts = histogram(x, CFG)
    v, c = sketch_var_cvar(counts, 0.95, CFG)
    v_exact = np.percentile(x, 5)
    tail = x[x <= v_exact]
    c_exact = tail.mean()
    assert abs(float(v) - v_exact) <= 2 * BIN_W
    assert abs(float(c) - c_exact) <= 4 * BIN_W
    assert float(c) <= float(v) + 1e-9  # CVaR <= VaR always


def test_sketch_mergeable(rng):
    x = rng.normal(0, 0.2, 100_000)
    c1 = histogram(x[:50_000], CFG)
    c2 = histogram(x[50_000:], CFG)
    whole = histogram(x, CFG)
    np.testing.assert_allclose(np.asarray(c1 + c2), np.asarray(whole), atol=0)


def test_sketch_clamps_outliers():
    x = np.array([-5.0, 10.0, 0.0])
    counts = np.asarray(histogram(x, CFG))
    assert counts[0] == 1 and counts[-1] == 1 and counts.sum() == 3


def test_tail_mean_empty_tail_falls_back():
    counts = histogram(np.array([1.0, 1.1, 1.2]), CFG)
    got = float(sketch_tail_mean(counts, -0.9, CFG))
    assert got == pytest.approx(-0.9)  # empty tail → threshold itself (cvar fallback)


# ---- adaptive log1p-space sketch (VERDICT r1 item 2) ---------------------------

def test_log1p_sketch_quantiles_on_wide_range(rng):
    """Returns spanning -99%..+5000% (weekly-BTC-like long horizon): the fixed
    linear grid would clamp everything above hi into one bin; the log1p sketch
    must resolve quantiles across the whole range."""
    r = np.expm1(rng.normal(0.5, 1.5, 400_000))        # lognormal - 1, huge spread
    cfg = SketchConfig(n_bins=8192, lo=np.log1p(-0.9999), hi=np.log1p(5000.0),
                       space="log1p")
    counts = histogram(r, cfg)
    w_u = (cfg.hi - cfg.lo) / cfg.n_bins
    for q in (0.01, 0.05, 0.5, 0.95, 0.99):
        got = float(sketch_quantile(counts, q, cfg))
        want = np.percentile(r, q * 100)
        # bin width is w_u in log1p space → relative tolerance ~2*w_u on 1+r
        assert abs(np.log1p(got) - np.log1p(want)) <= 2 * w_u, (q, got, want)


def test_log1p_sketch_var_cvar_vs_exact(rng):
    r = np.expm1(rng.normal(0.2, 0.9, 500_000))
    cfg = SketchConfig(n_bins=8192, lo=np.log1p(-0.999), hi=np.log1p(200.0),
                       space="log1p")
    counts = histogram(r, cfg)
    v, c = sketch_var_cvar(counts, 0.95, cfg)
    v_exact = np.percentile(r, 5)
    c_exact = r[r <= v_exact].mean()
    w_u = (cfg.hi - cfg.lo) / cfg.n_bins
    assert abs(np.log1p(float(v)) - np.log1p(v_exact)) <= 2 * w_u
    assert abs(float(c) - c_exact) <= 4 * w_u * (1 + abs(c_exact))
    assert float(c) <= float(v) + 1e-9


def test_auto_sketch_never_clamps():
    """auto_sketch's ±k-sigma analytic range must leave the edge bins empty for
    terminals actually drawn from those parameters — clamp bias is impossible
    by construction (replaces the old fixed-range clamp behavior)."""
    import jax as _jax
    from mcport.models.gbm import terminal_log_returns
    from mcport.ops.quantile import auto_sketch

    # long-horizon, high-vol parameters that overflow the old (lo=-1, hi=3) grid
    a = 3
    mean_step = np.array([0.004, 0.002, 0.006])
    chol = np.diag([0.09, 0.05, 0.12])                 # weekly-crypto-scale vol
    n_steps = 252
    cfg = auto_sketch(mean_step, chol, n_steps, n_bins=4096)
    assert cfg.space == "log1p"

    term = terminal_log_returns(
        _jax.random.key(0), jnp.asarray(mean_step), jnp.asarray(chol),
        65_536, n_steps, dtype=jnp.float32,
    )
    port = (jnp.exp(term) - 1.0) @ jnp.asarray([0.5, 0.3, 0.2], jnp.float32)
    counts = np.asarray(histogram(port, cfg))
    assert counts.sum() == 65_536
    assert counts[0] == 0 and counts[-1] == 0          # nothing clamped
    # sanity: quantiles come out in return space and are ordered
    q5, q95 = (float(sketch_quantile(counts, q, cfg)) for q in (0.05, 0.95))
    assert -1.0 < q5 < q95


def test_auto_sketch_weighted_range_is_tighter():
    from mcport.ops.quantile import auto_sketch

    mean_step = np.array([0.001, 0.001])
    chol = np.diag([0.02, 0.30])
    wide = auto_sketch(mean_step, chol, 64)
    tight = auto_sketch(mean_step, chol, 64, weights=np.array([0.99, 0.01]))
    assert tight.hi - tight.lo < wide.hi - wide.lo


def test_linear_space_unchanged_by_default():
    assert SketchConfig().space == "linear"
    # legacy linear behavior: same counts as before the space field existed
    x = np.array([-5.0, 10.0, 0.0])
    counts = np.asarray(histogram(x, CFG))
    assert counts[0] == 1 and counts[-1] == 1


# ---- QMC ---------------------------------------------------------------------
def test_halton_range_and_projection():
    u = np.asarray(halton(None, 1000, 5, jnp.float64))
    assert u.shape == (1000, 5)
    assert (u > 0).all() and (u < 1).all()
    # 1-D projections are near-uniform: mean ≈ 0.5 far tighter than MC error
    np.testing.assert_allclose(u.mean(0), 0.5, atol=0.01)


def test_halton_rotation_differs():
    a = np.asarray(halton(jax.random.key(0), 64, 3))
    b = np.asarray(halton(jax.random.key(1), 64, 3))
    assert not np.allclose(a, b)
    assert (a > 0).all() and (a < 1).all()


def test_sobol_points():
    u = sobol(0, 256, 8)
    assert u.shape == (256, 8)
    assert (u >= 0).all() and (u <= 1).all()
    np.testing.assert_allclose(u.mean(0), 0.5, atol=0.02)


@pytest.mark.parametrize("method", ["sobol", "halton"])
def test_qmc_beats_mc_on_smooth_integrand(method, rng):
    """Low-discrepancy integration error < plain MC error on a smooth function."""
    dim, n = 8, 4096
    # E[prod (1 + (u_j - 0.5))] = 1 exactly
    def integrand(u):
        return np.prod(1.0 + (u - 0.5), axis=1).mean()

    qmc_errs, mc_errs = [], []
    for s in range(8):
        if method == "sobol":
            u = sobol(s, n, dim).astype(np.float64)
        else:
            u = np.asarray(halton(jax.random.key(s), n, dim, jnp.float64))
        qmc_errs.append(abs(integrand(u) - 1.0))
        mc_errs.append(abs(integrand(rng.random((n, dim))) - 1.0))
    assert np.mean(qmc_errs) < np.mean(mc_errs)


def test_qmc_normals_moments():
    z = np.asarray(qmc_normals(4096, 4, "sobol", seed=1, dtype=jnp.float64))
    assert z.shape == (4096, 4)
    np.testing.assert_allclose(z.mean(0), 0.0, atol=0.02)
    np.testing.assert_allclose(z.std(0), 1.0, atol=0.02)


# ---- bootstrap error bars on sketched tail metrics (round 4) ---------------


def test_sketch_ci_matches_asymptotic_quantile_theory():
    """Multinomial-on-counts bootstrap se of the sketched VaR must match the
    asymptotic order-statistic se sqrt(a(1-a)/N)/f(q) for a normal sample."""
    from scipy.stats import norm

    from mcport.ops.quantile import histogram, sketch_var_cvar_ci

    rng = np.random.default_rng(0)
    n = 131_072
    x = rng.normal(0.05, 0.2, n).astype(np.float32)
    cfg = SketchConfig(n_bins=8192, lo=-1.0, hi=1.5, space="linear")
    counts = histogram(jnp.asarray(x), cfg)
    out = sketch_var_cvar_ci(counts, alpha=0.95, config=cfg, n_boot=200)
    true_var = 0.05 + 0.2 * norm.ppf(0.05)
    se_theory = np.sqrt(0.05 * 0.95 / n) / (norm.pdf(norm.ppf(0.05)) / 0.2)
    assert float(out["var_lo"]) <= float(out["var"]) <= float(out["var_hi"])
    assert float(out["var_lo"]) <= true_var <= float(out["var_hi"])
    np.testing.assert_allclose(float(out["var_se"]), se_theory, rtol=0.25)
    assert float(out["cvar_se"]) > 0
    # 4x the sample → half the se (1/sqrt(N) scaling through the bootstrap)
    x4 = rng.normal(0.05, 0.2, 4 * n).astype(np.float32)
    out4 = sketch_var_cvar_ci(histogram(jnp.asarray(x4), cfg), alpha=0.95,
                              config=cfg, n_boot=200)
    np.testing.assert_allclose(float(out["var_se"]) / float(out4["var_se"]),
                               2.0, rtol=0.35)


def test_sketch_quantile_ci_basic():
    from mcport.ops.quantile import histogram, sketch_quantile_ci

    rng = np.random.default_rng(1)
    x = rng.normal(-0.3, 0.1, 65_536).astype(np.float32)
    cfg = SketchConfig(n_bins=4096, lo=-1.0, hi=0.5, space="linear")
    out = sketch_quantile_ci(histogram(jnp.asarray(x), cfg), 0.05, cfg,
                             n_boot=150, seed=3)
    assert float(out["lo"]) <= float(out["value"]) <= float(out["hi"])
    assert 0 < float(out["se"]) < 0.01


def test_sample_ci_agrees_with_sketch_ci():
    """The exact (resampled top-k) and sketched (multinomial-on-counts)
    bootstraps estimate the same sampling distribution — their standard
    errors must agree within bootstrap noise."""
    from mcport.ops.quantile import (
        histogram, sample_var_cvar_ci, sketch_var_cvar_ci,
    )

    rng = np.random.default_rng(2)
    x = rng.normal(0.02, 0.15, 65_536).astype(np.float32)
    exact = sample_var_cvar_ci(jnp.asarray(x), alpha=0.95, n_boot=200, seed=1)
    cfg = SketchConfig(n_bins=8192, lo=-1.0, hi=1.0, space="linear")
    sk = sketch_var_cvar_ci(histogram(jnp.asarray(x), cfg), alpha=0.95,
                            config=cfg, n_boot=200, seed=1)
    np.testing.assert_allclose(float(exact["var"]), float(sk["var"]), atol=1e-3)
    np.testing.assert_allclose(float(exact["var_se"]), float(sk["var_se"]),
                               rtol=0.35)
    np.testing.assert_allclose(float(exact["cvar_se"]), float(sk["cvar_se"]),
                               rtol=0.35)
    assert float(exact["var_lo"]) <= float(exact["var"]) <= float(exact["var_hi"])
