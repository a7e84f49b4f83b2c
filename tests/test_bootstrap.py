"""Stationary block-bootstrap engine: law, reproducibility, tail semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.models.bootstrap import (
    bootstrap_risk,
    bootstrap_terminal_returns,
    _auto_sketch_from_history,
)

A, T = 3, 200


@pytest.fixture(scope="module")
def history():
    # correlated historical returns with distinctly non-Gaussian tails
    rng = np.random.default_rng(41)  # local: immune to suite draw order
    z = rng.standard_t(4, (T, A)) * 0.02
    z[:, 1] = 0.6 * z[:, 0] + 0.8 * z[:, 1]
    return (z + 0.003).astype(np.float32)


def test_reproducible_and_seed_sensitive(history):
    a = bootstrap_terminal_returns(jax.random.key(1), history, 512, 8)
    b = bootstrap_terminal_returns(jax.random.key(1), history, 512, 8)
    c = bootstrap_terminal_returns(jax.random.key(2), history, 512, 8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_iid_bootstrap_matches_analytic_moments(history):
    """p_restart=1 (iid rows): E[1+terminal] = (1 + mean_r)^n exactly, and the
    MC estimate must match within a few standard errors."""
    n_paths, n_steps = 60_000, 6
    term = np.asarray(bootstrap_terminal_returns(
        jax.random.key(0), history, n_paths, n_steps, p_restart=1.0,
        dtype=jnp.float64,
    ))
    mu_row = history.astype(np.float64).mean(axis=0)
    want = (1.0 + mu_row) ** n_steps - 1.0
    got = term.mean(axis=0)
    # per-asset std error of the terminal mean
    se = term.std(axis=0, ddof=1) / np.sqrt(n_paths)
    assert np.all(np.abs(got - want) < 5 * se)


def test_rows_are_joint_draws(history):
    """One step with p_restart=1 must reproduce the empirical joint rows —
    every simulated (A,) return equals some historical row exactly."""
    term = np.asarray(bootstrap_terminal_returns(
        jax.random.key(3), history, 2_000, 1, p_restart=1.0))
    hist_rows = history.astype(np.float32)
    # match each simulated row to the history (exact float equality)
    eq = (term[:, None, :] == hist_rows[None, :, :]).all(axis=2)
    assert eq.any(axis=1).all()


def test_block_continuation_preserves_serial_pairs(history):
    """With p_restart→0, consecutive steps walk the history circularly, so
    2-step paths compound ADJACENT historical rows."""
    term = np.asarray(bootstrap_terminal_returns(
        jax.random.key(4), history, 1_000, 2, p_restart=1e-9, dtype=jnp.float64))
    h = history.astype(np.float64)
    pair = (1 + h) * (1 + np.roll(h, -1, axis=0)) - 1.0  # all adjacent products
    eq = np.isclose(term[:, None, :], pair[None, :, :], rtol=1e-12).all(axis=2)
    assert eq.any(axis=1).all()


def test_bootstrap_risk_bundle(history):
    w = np.array([0.5, 0.3, 0.2], np.float32)
    out = bootstrap_risk(jax.random.key(0), history, w, n_paths=40_000, n_steps=12)
    v, c = float(out.var), float(out.cvar)
    assert c <= v < float(out.port_mean)
    assert float(out.hist.sum()) == 40_000
    counts = np.asarray(out.hist)
    assert counts[0] == 0 and counts[-1] == 0  # covering sketch never clamps


def test_auto_sketch_covers_extreme_path(history):
    cfg = _auto_sketch_from_history(history, 10)
    worst_path = (1 + float(history.min())) ** 10 - 1
    best_path = (1 + float(history.max())) ** 10 - 1
    assert cfg.space == "log1p"
    assert cfg.lo <= np.log1p(max(worst_path, -0.9999)) + 1e-9
    assert cfg.hi >= np.log1p(best_path) - 1e-9
