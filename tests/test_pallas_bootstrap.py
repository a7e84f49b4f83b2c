"""Fused bootstrap kernel vs the lax engine (interpret tier; kernel math only —
the compiled hardware-PRNG path is covered by the -m tpu tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.models.bootstrap import bootstrap_risk, bootstrap_terminal_returns
from mcport.ops.pallas_bootstrap import pallas_bootstrap_terminal_returns

T, A = 150, 3


@pytest.fixture(scope="module")
def history():
    rng = np.random.default_rng(42)  # local: immune to suite draw order
    return (rng.standard_t(5, (T, A)) * 0.02 + 0.002).astype(np.float32)


def test_one_step_rows_are_history_rows(history):
    term = np.asarray(pallas_bootstrap_terminal_returns(
        3, history, 2_048, 1, p_restart=1.0, interpret=True))
    eq = np.isclose(term[:, None, :], history[None, :, :],
                    rtol=1e-6, atol=1e-9).all(axis=2)
    assert eq.any(axis=1).all()


def test_iid_moments_match_analytic(history):
    n, steps = 65_536, 6
    term = np.asarray(pallas_bootstrap_terminal_returns(
        3, history, n, steps, p_restart=1.0, interpret=True)).astype(np.float64)
    mu_row = history.astype(np.float64).mean(axis=0)
    want = (1 + mu_row) ** steps - 1
    se = term.std(axis=0, ddof=1) / np.sqrt(n)
    assert np.all(np.abs(term.mean(axis=0) - want) < 5 * se)


def test_block_continuation_adjacent_rows(history):
    term = np.asarray(pallas_bootstrap_terminal_returns(
        5, history, 1_024, 2, p_restart=1e-9, interpret=True)).astype(np.float64)
    h = history.astype(np.float64)
    pair = (1 + h) * (1 + np.roll(h, -1, axis=0)) - 1
    eq = np.isclose(term[:, None, :], pair[None, :, :],
                    rtol=1e-5, atol=1e-6).all(axis=2)
    assert eq.any(axis=1).all()


def test_reproducible_and_block_streams_distinct(history):
    a = pallas_bootstrap_terminal_returns(7, history, 2_048, 4, interpret=True)
    b = pallas_bootstrap_terminal_returns(7, history, 2_048, 4, interpret=True)
    c = pallas_bootstrap_terminal_returns(8, history, 2_048, 4, interpret=True)
    assert bool(jnp.array_equal(a, b))
    assert not bool(jnp.array_equal(a, c))
    assert not np.array_equal(np.asarray(a)[:1024], np.asarray(a)[1024:])


def test_law_parity_vs_lax_engine(history):
    """Same model, independent streams → matching terminal mean/std within MC
    error (the GBM-kernel parity pattern)."""
    n, steps, p = 65_536, 12, 0.25
    kern = np.asarray(pallas_bootstrap_terminal_returns(
        11, history, n, steps, p_restart=p, interpret=True)).astype(np.float64)
    lax_t = np.asarray(bootstrap_terminal_returns(
        jax.random.key(4), history, n, steps, p_restart=p,
        dtype=jnp.float64))
    se_m = lax_t.std(axis=0, ddof=1) / np.sqrt(n)
    assert np.all(np.abs(kern.mean(0) - lax_t.mean(0)) < 6 * se_m)
    # std agreement within ~ a few percent (4th-moment MC error)
    assert np.all(np.abs(kern.std(0) / lax_t.std(0) - 1) < 0.1)


def test_bootstrap_risk_pallas_flag_interpret(history):
    """use_pallas path through bootstrap_risk (interpret-compatible only on
    TPU; here we call the kernel directly via the flag on CPU → must raise or
    be skipped). On CPU backends the flag defaults off."""
    w = np.array([0.5, 0.3, 0.2], np.float32)
    out = bootstrap_risk(jax.random.key(0), history, w, n_paths=8_192,
                         n_steps=8)  # auto: lax on CPU
    assert float(out.cvar) <= float(out.var)
