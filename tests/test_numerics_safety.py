"""Numerics safety: NaN propagation guards (SURVEY.md §5 'race detection /
sanitizers' — JAX is functional so data races don't apply; the analogous failure
class is silent NaN/Inf propagation, checked here with jax_debug_nans and
checkify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.models.gbm import terminal_log_returns
from mcport.ops.quantile import histogram, sketch_var_cvar
from mcport.stats import asset_stats


def test_core_pipeline_clean_under_debug_nans(rng):
    """The hot path raises nothing with jax_debug_nans enabled — no hidden NaNs."""
    jax.config.update("jax_debug_nans", True)
    try:
        chol = np.linalg.cholesky(0.0004 * (0.6 * np.eye(3) + 0.4))
        term = terminal_log_returns(
            jax.random.key(0), np.full(3, 1e-3), chol, 1024, 8, dtype=jnp.float64
        )
        port = (jnp.exp(term) - 1.0) @ jnp.full(3, 1 / 3)
        counts = histogram(port)
        v, c = sketch_var_cvar(counts)
        jax.block_until_ready((v, c))
        series = rng.normal(0.01, 0.05, 100)
        stats = asset_stats(series, 12, 0.03)
        jax.block_until_ready(stats["sharpe"])
    finally:
        jax.config.update("jax_debug_nans", False)


def test_checkify_catches_bad_inputs():
    """checkify wraps the lax engine and reports div-by-zero class errors."""
    from jax.experimental import checkify

    def risky(x):
        checkify.check(jnp.all(jnp.isfinite(x)), "non-finite input")
        return jnp.log(x).sum()

    checked = checkify.checkify(risky)
    err, _ = checked(jnp.array([1.0, 2.0]))
    err.throw()  # no error
    err, _ = checked(jnp.array([jnp.inf, 1.0]))
    with pytest.raises(Exception, match="non-finite"):
        err.throw()


def test_degenerate_covariance_does_not_nan():
    """Zero-variance assets (constant prices) survive estimation via jitter."""
    from mcport.models import estimate_gbm

    prices = np.column_stack([
        np.full(50, 100.0),                       # constant asset
        100 * np.exp(np.cumsum(np.random.default_rng(0).normal(0, 0.01, 50))),
    ])
    params = estimate_gbm(prices)
    assert np.isfinite(params.chol_step).all()
    term = terminal_log_returns(
        jax.random.key(0), params.mean_step, params.chol_step, 256, 4, dtype=jnp.float64
    )
    assert bool(jnp.isfinite(term).all())
    # the constant asset's simulated log return is (near-)zero
    assert float(jnp.abs(jnp.asarray(term)[:, 0]).max()) < 1e-4


def test_family_path_engines_clean_under_debug_nans():
    """The family path-stats engines (lax forms, hedged included) run clean
    under jax_debug_nans with degenerate inputs: zero-vol GARCH, constant
    history bootstrap, zero-rate jumps."""
    import jax
    import numpy as np

    from mcport.models.bootstrap import bootstrap_path_stats
    from mcport.models.garch_mc import CCCGarchParams, garch_path_stats
    from mcport.models.jump import merton_path_stats

    a = 2
    w = np.array([[0.5, 0.5]], np.float32)
    with jax.debug_nans(True):
        # zero-vol GARCH: sigma^2 = 0 throughout — sqrt(max(s2, 0)) guard
        p0 = CCCGarchParams(
            mu=np.zeros(a), omega=np.zeros(a), alpha=np.zeros(a),
            beta=np.zeros(a), corr_chol=np.eye(a), sigma2_0=np.zeros(a),
            eps2_0=np.zeros(a))
        t, d = garch_path_stats(jax.random.key(0), p0, w, 64, 4)
        assert np.isfinite(np.asarray(t)).all()
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-7)
        # constant history: every resampled row identical
        hist = np.full((32, a), 0.01, np.float32)
        t, d = bootstrap_path_stats(jax.random.key(1), hist, w, 64, 4)
        np.testing.assert_allclose(np.asarray(t), (1.01) ** 4 - 1, rtol=1e-5)
        # zero jump rate + zero diffusion: exact zero returns
        t, d = merton_path_stats(
            jax.random.key(2), np.zeros(a, np.float32),
            np.zeros((a, a), np.float32), 0.0, np.full(a, -0.5, np.float32),
            np.zeros(a, np.float32), w, 64, 4)
        np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-7)


def test_greeks_and_ci_clean_under_debug_nans():
    """The AD tier (jacobians, LR gamma) and the bootstrap CI raise nothing
    under jax_debug_nans — no hidden NaN/Inf in forward OR reverse passes
    (reverse-mode through top_k and cho_solve are the risky spots)."""
    jax.config.update("jax_debug_nans", True)
    try:
        from mcport.config import GBMConfig, SketchConfig
        from mcport.engine.greeks import (
            hedged_mean_gamma, hedged_sensitivities, portfolio_sensitivities,
        )
        from mcport.models.gbm import GBMParams
        from mcport.ops.quantile import sketch_var_cvar_ci
        from mcport.options.hedged import HedgeSpec

        chol = np.linalg.cholesky(0.0004 * (0.6 * np.eye(3) + 0.4))
        params = GBMParams(mean_step=np.full(3, 1e-3), chol_step=chol,
                           s0=np.full(3, 100.0))
        w = np.full(3, 1 / 3)
        cfg = GBMConfig(n_paths=1024, n_steps=4)
        out = portfolio_sensitivities(params, w, cfg)
        assert np.isfinite(out.d_cvar_dw).all()
        spec = HedgeSpec.build({0: [("buy_put", 95.0, 1.0, 1.0)]},
                               names=["a", "b", "c"])
        s0 = np.full(3, 100.0)
        h = hedged_sensitivities(params, w, spec, s0, cfg)
        assert np.isfinite(h.d_cvar_ds0).all()
        gam, se = hedged_mean_gamma(params, w, spec, s0, cfg)
        assert np.isfinite(gam).all() and np.isfinite(se).all()

        counts = histogram(jnp.asarray(np.linspace(-0.5, 0.5, 4096)),
                           SketchConfig())
        ci = sketch_var_cvar_ci(counts, n_boot=50)
        jax.block_until_ready(ci["var_se"])
    finally:
        jax.config.update("jax_debug_nans", False)
