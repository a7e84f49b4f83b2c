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
