"""American-exercise LSMC tier vs closed-form and lattice oracles.

Oracles: a 1000-step CRR binomial tree (American put — the standard lattice
reference) and Black-Scholes (American call on a non-dividend asset is never
exercised early, Merton 1973, so its value IS the European one). The LSMC
estimate is low-biased (suboptimal fitted policy), so tolerances are
one-sided-aware: value must sit within MC error BELOW the oracle and never
meaningfully above it.
"""

import numpy as np
import pytest

from mcport.options.american import (AmericanPolicy, american_value,
                                     bs_european_value, exercise_boundary)

PATHS = 32_768
STEPS = 40
T_YEARS = 0.5
SIG_STEP = 0.30 * np.sqrt(T_YEARS / STEPS)
R_STEP = 0.06 * T_YEARS / STEPS


def binom_american(s0, k, sig_ann, r_ann, t_years, n=1000, put=True,
                   q_ann=0.0):
    """CRR binomial American option value (float64 numpy); ``q_ann`` is a
    continuous dividend yield (risk-neutral up-probability uses e^{(r-q)dt},
    discounting stays at r)."""
    dt = t_years / n
    u = np.exp(sig_ann * np.sqrt(dt))
    d = 1.0 / u
    disc = np.exp(-r_ann * dt)
    p = (np.exp((r_ann - q_ann) * dt) - d) / (u - d)

    def intrinsic(s):
        return np.maximum(k - s, 0.0) if put else np.maximum(s - k, 0.0)

    j = np.arange(n + 1)
    v = intrinsic(s0 * u**j * d ** (n - j))
    for step in range(n - 1, -1, -1):
        j = np.arange(step + 1)
        v = disc * (p * v[1:] + (1.0 - p) * v[:-1])
        v = np.maximum(v, intrinsic(s0 * u**j * d ** (step - j)))
    return float(v[0])


@pytest.fixture(scope="module")
def atm_put():
    return american_value(0, [100.0], SIG_STEP, [100.0], is_put=True,
                          rate_step=R_STEP, n_paths=PATHS, n_steps=STEPS)


def test_put_matches_binomial(atm_put):
    oracle = binom_american(100.0, 100.0, 0.30, 0.06, T_YEARS, put=True)
    v, se = atm_put.value[0], atm_put.se[0]
    # low-biased estimator: below-oracle slack is MC error + a bias budget,
    # above-oracle slack is MC error only
    assert oracle - v < 4.0 * se + 0.01 * oracle
    assert v - oracle < 4.0 * se


def test_early_exercise_premium_positive(atm_put):
    """r > 0 makes the ATM American put strictly richer than European."""
    eur = bs_european_value([100.0], SIG_STEP, [100.0], True, R_STEP, STEPS)
    assert atm_put.european[0] == pytest.approx(float(eur[0]))
    assert atm_put.early_premium[0] > 4.0 * atm_put.se[0]


def test_call_no_dividend_is_european():
    pol = american_value(1, [100.0], SIG_STEP, [105.0], is_put=False,
                         rate_step=R_STEP, n_paths=PATHS, n_steps=STEPS)
    assert abs(pol.value[0] - pol.european[0]) < 4.0 * pol.se[0]


def test_deep_itm_put_exercises_immediately():
    pol = american_value(2, [100.0], SIG_STEP / 3.0, [150.0], is_put=True,
                         rate_step=R_STEP, n_paths=PATHS, n_steps=STEPS)
    # immediate-exercise region: value pinned to intrinsic (never below, and
    # with low vol barely above), NOT the discounted European forward value
    assert pol.value[0] >= 50.0 - 4.0 * pol.se[0]
    assert pol.value[0] < 52.0
    assert pol.early_premium[0] > 1.0   # discounting makes European << K - S0


def test_dividend_call_matches_binomial_and_exercises_early():
    """q > 0 breaks Merton's no-early-exercise result: the American call
    gains a positive premium over European and must match the
    dividend-adjusted lattice."""
    q_ann = 0.08
    q_step = q_ann * T_YEARS / STEPS
    pol = american_value(5, [100.0], SIG_STEP, [95.0], is_put=False,
                         rate_step=R_STEP, n_paths=PATHS, n_steps=STEPS,
                         div_step=q_step)
    oracle = binom_american(100.0, 95.0, 0.30, 0.06, T_YEARS, put=False,
                            q_ann=q_ann)
    v, se = pol.value[0], pol.se[0]
    assert oracle - v < 4.0 * se + 0.01 * oracle
    assert v - oracle < 4.0 * se
    assert pol.early_premium[0] > 4.0 * se
    # the call boundary exists (above strike) at least near expiry
    b = exercise_boundary(pol)
    tail = b[-len(b) // 4:]
    assert np.isfinite(tail).any() and np.nanmin(tail) > 95.0


def test_put_boundary_shape(atm_put):
    b = exercise_boundary(atm_put)
    assert b.shape == (STEPS - 1,)
    assert np.isfinite(b).all()
    assert (b < 100.0).all()            # strictly below strike
    q = len(b) // 4
    # boundary rises toward expiry (noisy at early dates: compare quarters)
    assert b[-q:].mean() > b[:q].mean()


def test_batch_asset_independence():
    two = american_value(3, [100.0, 80.0], [SIG_STEP, SIG_STEP * 1.5],
                         [100.0, 85.0], is_put=[True, True],
                         rate_step=R_STEP, n_paths=PATHS, n_steps=STEPS)
    other = american_value(3, [100.0, 200.0], [SIG_STEP, SIG_STEP],
                           [100.0, 150.0], is_put=[True, False],
                           rate_step=R_STEP, n_paths=PATHS, n_steps=STEPS)
    # asset 0's stream and value are untouched by its batch neighbors
    assert two.value[0] == other.value[0]
    assert np.array_equal(two.betas[0], other.betas[0])
    solo = american_value(3, [100.0], SIG_STEP, [100.0], is_put=True,
                          rate_step=R_STEP, n_paths=PATHS, n_steps=STEPS)
    assert solo.value[0] == two.value[0]


def test_policy_exercise_rule(atm_put):
    import jax.numpy as jnp

    s = jnp.asarray([60.0, 95.0, 101.0], jnp.float32)
    ex = np.asarray(atm_put.exercise(STEPS - 1, s, 0))
    assert ex[0]                        # deep ITM near expiry: exercise
    assert not ex[2]                    # OTM: never


def test_validation():
    with pytest.raises(ValueError, match="even"):
        american_value(0, [100.0], SIG_STEP, [100.0], n_paths=1001,
                       n_steps=4)
    with pytest.raises(ValueError, match="sigma"):
        american_value(0, [100.0], 0.0, [100.0], n_paths=64, n_steps=4)


def test_policy_dataclass_fields(atm_put):
    assert isinstance(atm_put, AmericanPolicy)
    assert atm_put.betas.shape == (1, STEPS - 1, 4)
    assert atm_put.se[0] > 0.0


# ---- policy-frozen pathwise Greeks ------------------------------------------


def bs_call_delta(s0, k, sig_ann, r_ann, t_years):
    from math import erf, log, sqrt

    d1 = (log(s0 / k) + (r_ann + 0.5 * sig_ann**2) * t_years) / (
        sig_ann * sqrt(t_years))
    return 0.5 * (1.0 + erf(d1 / sqrt(2.0)))


def test_greeks_put_delta_matches_binomial_fd(atm_put):
    """Frozen-policy pathwise delta vs a central finite difference of the
    1000-step binomial American value (h small enough that the FD error is
    negligible next to the MC tolerance)."""
    from mcport.options.american import american_greeks

    g = american_greeks(atm_put, 11, [100.0], SIG_STEP, n_paths=PATHS)
    h = 1.0
    up = binom_american(100.0 + h, 100.0, 0.30, 0.06, T_YEARS, put=True)
    dn = binom_american(100.0 - h, 100.0, 0.30, 0.06, T_YEARS, put=True)
    oracle = (up - dn) / (2.0 * h)
    assert abs(g.delta[0] - oracle) < 0.02
    assert -1.0 < g.delta[0] < 0.0
    assert g.vega[0] > 0.0
    # the replayed value agrees with the fitting-run value within MC error
    assert abs(g.value[0] - atm_put.value[0]) < 4.0 * (g.se[0]
                                                       + atm_put.se[0])


def test_greeks_call_no_dividend_matches_bs_delta():
    """A never-firing policy (non-dividend call) reduces the stopped payoff
    to the European one, whose pathwise delta must hit Black-Scholes."""
    from mcport.options.american import american_greeks, american_value

    pol = american_value(4, [100.0], SIG_STEP, [105.0], is_put=False,
                         rate_step=R_STEP, n_paths=PATHS, n_steps=STEPS)
    g = american_greeks(pol, 12, [100.0], SIG_STEP, n_paths=PATHS)
    oracle = bs_call_delta(100.0, 105.0, 0.30, 0.06, T_YEARS)
    assert abs(g.delta[0] - oracle) < 0.02
    assert 0.0 < g.delta[0] < 1.0


def test_greeks_validation(atm_put):
    from mcport.options.american import american_greeks

    with pytest.raises(ValueError, match="asset batch"):
        american_greeks(atm_put, 0, [100.0, 90.0], SIG_STEP, n_paths=64)
    with pytest.raises(ValueError, match="even"):
        american_greeks(atm_put, 0, [100.0], SIG_STEP, n_paths=65)


# ---- physical-measure American settlement ----------------------------------


@pytest.fixture(scope="module")
def settle_setup():
    import jax

    from mcport.models.gbm import GBMParams
    from mcport.options import HedgeSpec, LegType, Legs
    from mcport.options.american import _leg_boundaries

    params = GBMParams(s0=np.array([100.0, 50.0]),
                       mean_step=np.array([0.002, 0.001]),
                       chol_step=np.linalg.cholesky(np.diag([0.0016,
                                                             0.0009])))
    spec = HedgeSpec.build(
        {0: Legs.from_rows([(LegType.BUY_ASSET, 0.0, 0.0, 1.0),
                            (LegType.BUY_PUT, 95.0, 2.0, 1.0)])},
        ["a0", "a1"])
    sigma_step = np.sqrt(np.einsum("ij,ij->i", params.chol_step,
                                   params.chol_step))
    bnd = _leg_boundaries(spec, params.s0, sigma_step, 0.0005, 26, 1, 8192)
    return jax, params, spec, bnd


def test_settlement_never_fire_is_european_bitwise(settle_setup):
    from mcport.options.american import american_hedged_terminal_returns

    jax, params, spec, bnd = settle_setup
    never = np.full_like(bnd, np.inf)
    never[0, 1, :] = -np.inf                      # the put leg's never-fire
    am, eu = american_hedged_terminal_returns(
        jax.random.key(0), params.s0, params.mean_step, params.chol_step,
        spec.arrays, never, 0.0005, 4096, 26)
    assert bool((am == eu).all())


def test_settlement_european_column_matches_hedged_module(settle_setup):
    """The European side of the pair must agree with the framework's own
    hedged_terminal_returns on identical terminal prices."""
    import jax.numpy as jnp

    from mcport.options.american import american_hedged_terminal_returns
    from mcport.options.hedged import hedged_terminal_returns

    jax, params, spec, bnd = settle_setup
    am, eu = american_hedged_terminal_returns(
        jax.random.key(3), params.s0, params.mean_step, params.chol_step,
        spec.arrays, bnd, 0.0005, 4096, 26)
    # reconstruct the same terminal logs (same fold_in stream)
    m = jnp.asarray(params.mean_step, jnp.float32)
    lt = jnp.asarray(params.chol_step, jnp.float32).T
    logs = jnp.zeros((4096, 2), jnp.float32)
    for t in range(1, 27):
        z = jax.random.normal(jax.random.fold_in(jax.random.key(3), t),
                              (4096, 2), jnp.float32)
        logs = logs + m + z @ lt
    ref = hedged_terminal_returns(logs, jnp.asarray(params.s0, jnp.float32),
                                  *spec.arrays)
    np.testing.assert_allclose(np.asarray(eu), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_settlement_rn_consistency_with_lsmc_value():
    """Under the RISK-NEUTRAL law, the American-settled put's discounted
    mean payoff must reproduce the LSMC value (independent paths, same
    fitted thresholds) — ties the settlement engine to the pricer."""
    import jax

    from mcport.models.gbm import GBMParams
    from mcport.options import HedgeSpec, LegType, Legs
    from mcport.options.american import (_leg_boundaries,
                                         american_hedged_terminal_returns,
                                         american_value)

    sig, r, steps, k = SIG_STEP, R_STEP, 26, 100.0
    pol = american_value(7, [100.0], sig, [k], is_put=True, rate_step=r,
                         n_paths=65_536, n_steps=steps)
    params = GBMParams(s0=np.array([100.0]),
                       mean_step=np.array([r - 0.5 * sig * sig]),
                       chol_step=np.array([[sig]]))
    spec = HedgeSpec.build(
        {0: Legs.from_rows([(LegType.BUY_PUT, k, 0.0, 1.0)])}, ["a0"])
    bnd = _leg_boundaries(spec, params.s0, np.array([sig]), r, steps, 6,
                          65_536)
    am, _ = american_hedged_terminal_returns(
        jax.random.key(9), params.s0, params.mean_step, params.chol_step,
        spec.arrays, bnd, r, 65_536, steps)
    payoff = np.asarray(am[:, 0], np.float64) * 100.0   # return -> $
    v = np.exp(-r * steps) * payoff.mean()
    se = np.exp(-r * steps) * payoff.std(ddof=1) / np.sqrt(len(payoff))
    assert abs(v - pol.value[0]) < 4.0 * (se + pol.se[0])


def test_settlement_tail_risk_api(settle_setup):
    from mcport.options.american import american_hedged_tail_risk

    _, params, spec, _ = settle_setup
    out = american_hedged_tail_risk(
        params, np.array([0.6, 0.4]), spec, rate_step=0.0005, alpha=0.95,
        n_paths=8192, n_steps=26, seed=0, policy_paths=8192)
    for tag in ("american", "european"):
        assert out[tag]["cvar"] <= out[tag]["var"]
    f = out["exercise_frequency"]
    assert f.shape == (2,)
    assert f[1] == 0.0 and 0.0 < f[0] < 1.0        # only the hedged asset
    # the American book can only differ where exercise fired
    assert out["american"]["mean"] != out["european"]["mean"]
