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


def binom_american(s0, k, sig_ann, r_ann, t_years, n=1000, put=True):
    """CRR binomial American option value (float64 numpy)."""
    dt = t_years / n
    u = np.exp(sig_ann * np.sqrt(dt))
    d = 1.0 / u
    disc = np.exp(-r_ann * dt)
    p = (np.exp(r_ann * dt) - d) / (u - d)

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
