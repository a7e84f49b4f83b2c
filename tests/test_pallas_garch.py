"""Pallas GARCH kernel vs the lax reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcport.models.garch_mc import CCCGarchParams, garch_terminal_returns
from mcport.ops.pallas_garch import pallas_garch_terminal_returns

A = 2
PARAMS = CCCGarchParams(
    mu=np.array([5e-4, 1e-3]),
    omega=np.array([4e-6, 6e-6]),
    alpha=np.array([0.08, 0.12]),
    beta=np.array([0.88, 0.82]),
    corr_chol=np.linalg.cholesky(np.array([[1.0, 0.6], [0.6, 1.0]])),
    sigma2_0=np.array([1e-4, 2e-4]),
    eps2_0=np.array([1e-4, 2e-4]),
)
KW = dict(interpret=True, block=128)


def test_kernel_matches_lax_law():
    n, steps = 20_000, 32
    got = np.asarray(pallas_garch_terminal_returns(3, PARAMS, n, steps, **KW))
    ref = np.asarray(garch_terminal_returns(jax.random.key(3), PARAMS, n, steps,
                                            jnp.float64))
    assert got.shape == (n, A)
    se = ref.std(0) / np.sqrt(n)
    np.testing.assert_allclose(got.mean(0), ref.mean(0), atol=float(6 * se.max()))
    np.testing.assert_allclose(got.std(0), ref.std(0), rtol=0.06)
    # cross-asset correlation carried through the CCC structure
    c_got = np.corrcoef(got, rowvar=False)[0, 1]
    c_ref = np.corrcoef(ref, rowvar=False)[0, 1]
    assert abs(c_got - c_ref) < 0.05


def test_kernel_zero_vol_closed_form():
    p = CCCGarchParams(
        mu=np.array([0.01, -0.005]),
        omega=np.zeros(A), alpha=np.zeros(A), beta=np.zeros(A),
        corr_chol=np.eye(A), sigma2_0=np.zeros(A), eps2_0=np.zeros(A),
    )
    out = np.asarray(pallas_garch_terminal_returns(1, p, 64, 6, **KW))
    np.testing.assert_allclose(out[:, 0], (1.01) ** 6 - 1, rtol=1e-6)
    np.testing.assert_allclose(out[:, 1], (0.995) ** 6 - 1, rtol=1e-6)


def test_kernel_deterministic_and_odd_steps():
    a = np.asarray(pallas_garch_terminal_returns(5, PARAMS, 300, 7, **KW))
    b = np.asarray(pallas_garch_terminal_returns(5, PARAMS, 300, 7, **KW))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()
