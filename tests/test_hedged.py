"""Hedged simulated tier vs the NumPy leg-return oracle (app.py:164-180).

The oracle is the same per-leg formula test_options.py pins; here it is
applied to simulated terminal prices (terminal composition) and per-step path
moves, and the engines' hedged outputs are checked against scoring the
transformed matrix directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.models.gbm import GBMParams, terminal_log_returns
from mcport.options import (
    HedgeSpec,
    LegType,
    Legs,
    auto_hedged_sketch,
    hedged_from_simple,
    hedged_return_bounds,
    hedged_step_returns,
    hedged_terminal_returns,
)

ATOL = 1e-6


def np_leg_return(t, price, prev, strike, premium):
    """Reference per-period leg return (app.py:164-180) — same oracle as
    tests/test_options.py."""
    if prev == 0:
        return 0.0
    if t == LegType.BUY_ASSET:
        return (price - prev) / prev
    if t == LegType.SELL_ASSET:
        return (prev - price) / prev
    if t == LegType.BUY_CALL:
        return (max(price - strike, 0) - premium) / prev
    if t == LegType.SELL_CALL:
        return (premium - max(price - strike, 0)) / prev
    if t == LegType.BUY_PUT:
        return (max(strike - price, 0) - premium) / prev
    if t == LegType.SELL_PUT:
        return (premium - max(strike - price, 0)) / prev
    if t == LegType.SELL_FUTURES:
        return (prev - price) / prev
    return 0.0


A = 4
NAMES = ["BTC", "ETH", "GOLD", "SOL"]
S0 = np.array([100.0, 50.0, 20.0, 8.0])
LEGS = {
    # married put on BTC: buy asset + buy 0.9x put with premium
    "BTC": Legs.from_rows([(LegType.BUY_ASSET, 0.0, 0.0, 1.0),
                           (LegType.BUY_PUT, 90.0, 2.5, 1.0)]),
    # covered call on GOLD (reference: short call only, no underlying leg)
    2: Legs.from_rows([(LegType.SELL_CALL, 22.0, 0.8, 1.0)]),
}


@pytest.fixture(scope="module")
def spec():
    return HedgeSpec.build(LEGS, NAMES)


@pytest.fixture(scope="module")
def params():
    rng = np.random.default_rng(3)
    corr = 0.4 * np.eye(A) + 0.6
    vols = np.array([0.06, 0.07, 0.02, 0.09])
    cov = vols[:, None] * vols[None, :] * corr
    return GBMParams(s0=S0, mean_step=np.array([2e-3, 1e-3, 5e-4, 3e-3]),
                     chol_step=np.linalg.cholesky(cov))


def oracle_hedged(spec, S, s0):
    """(N, A) hedged returns via the scalar oracle."""
    n, a = S.shape
    out = np.zeros((n, a))
    for i in range(a):
        for j in range(n):
            out[j, i] = sum(
                spec.qty[i, l] * np_leg_return(
                    int(spec.type_id[i, l]), S[j, i], s0[i],
                    spec.strike[i, l], spec.premium[i, l])
                for l in range(spec.type_id.shape[1]))
    return out


def test_build_validates_and_pads(spec):
    assert spec.type_id.shape == (A, 2)
    assert spec.hedged_mask.tolist() == [True, False, True, False]
    # unhedged rows: implicit BUY_ASSET qty 1
    assert spec.type_id[1, 0] == int(LegType.BUY_ASSET) and spec.qty[1, 0] == 1.0
    assert spec.qty[1, 1] == 0.0
    with pytest.raises(ValueError, match="not in the universe"):
        HedgeSpec.build({"NOPE": LEGS["BTC"]}, NAMES)
    with pytest.raises(ValueError, match="out of range"):
        HedgeSpec.build({7: LEGS["BTC"]}, NAMES)


def test_terminal_matches_oracle(spec):
    rng = np.random.default_rng(0)
    term_log = rng.normal(0.0, 0.3, (64, A))
    S = S0 * np.exp(term_log)
    got = np.asarray(hedged_terminal_returns(
        jnp.asarray(term_log), jnp.asarray(S0), *spec.arrays))
    np.testing.assert_allclose(got, oracle_hedged(spec, S, S0), atol=ATOL)


def test_unhedged_assets_reduce_to_simple_returns(spec):
    term_log = np.random.default_rng(1).normal(0.0, 0.2, (32, A))
    got = np.asarray(hedged_terminal_returns(
        jnp.asarray(term_log), jnp.asarray(S0), *spec.arrays))
    plain = np.exp(term_log) - 1.0
    np.testing.assert_allclose(got[:, [1, 3]], plain[:, [1, 3]], atol=ATOL)
    # hedged columns differ (the put kicks in below strike)
    assert np.abs(got[:, 0] - plain[:, 0]).max() > 1e-3


def test_from_simple_consistent(spec):
    term_log = np.random.default_rng(2).normal(0.0, 0.25, (16, A))
    a = hedged_terminal_returns(jnp.asarray(term_log), jnp.asarray(S0), *spec.arrays)
    b = hedged_from_simple(jnp.expm1(jnp.asarray(term_log)), jnp.asarray(S0),
                           *spec.arrays)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_step_returns_match_series_oracle(spec):
    """Per-step settlement on a simulated path == calc_options_series on that
    path's prices (the reference loop, oracle np_series semantics)."""
    rng = np.random.default_rng(4)
    prices = 100.0 * np.exp(np.cumsum(rng.normal(0, 0.05, 12)))
    prices = np.concatenate([[100.0], prices])
    legs = LEGS["BTC"]
    spec1 = HedgeSpec.build({"X": legs}, ["X"])
    got = np.asarray(hedged_step_returns(
        jnp.asarray(prices[:-1])[:, None], jnp.asarray(prices[1:])[:, None],
        *spec1.arrays))[:, 0]
    want = np.array([
        sum(q * np_leg_return(int(t), prices[i + 1], prices[i], k, p)
            for t, k, p, q in legs.rows())
        for i in range(len(prices) - 1)])
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_return_bounds_are_exact_pwl_extrema(spec):
    s_lo, s_hi = S0 * 0.4, S0 * 2.5
    lo, hi = hedged_return_bounds(spec, s_lo, s_hi, S0)
    # dense grid check: all grid evals within [lo, hi], extremes attained
    grid = np.linspace(s_lo, s_hi, 4001)          # (G, A)
    r = oracle_hedged(spec, grid, S0)
    assert (r >= lo[None, :] - 1e-12).all()
    assert (r <= hi[None, :] + 1e-12).all()
    np.testing.assert_allclose(r.min(0), lo, atol=1e-3)  # grid resolution
    np.testing.assert_allclose(r.max(0), hi, atol=1e-3)
    # covered-call asset: short call makes the lower bound fall below -1
    # territory for big up-moves (bounded only by s_hi)
    assert lo[2] < 0.0


def test_auto_hedged_sketch_covers(params, spec):
    sk = auto_hedged_sketch(params, 52, spec)
    assert sk.space == "linear"
    term = terminal_log_returns(
        jax.random.key(0), jnp.asarray(params.mean_step, jnp.float32),
        jnp.asarray(params.chol_step, jnp.float32), 4096, 52)
    h = np.asarray(hedged_terminal_returns(
        term, jnp.asarray(params.s0, jnp.float32), *spec.arrays))
    port = h @ np.full(A, 0.25)
    assert port.min() > sk.lo and port.max() < sk.hi
