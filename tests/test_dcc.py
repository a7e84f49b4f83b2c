"""DCC-GARCH(1,1): estimation recovery, CCC degeneration, risk coherence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.models.dcc import (
    DCCGarchParams,
    dcc_risk,
    dcc_terminal_returns,
    estimate_dcc_garch,
)
from mcport.models.garch_mc import CCCGarchParams, garch_terminal_returns

A = 2


def _simulate_dcc_host(t_len, a_c, b_c, rho=0.3, seed=0):
    """Host-numpy DCC-GARCH data generator (small, test-only oracle)."""
    rng = np.random.default_rng(seed)
    omega, alpha, beta = 2e-6, 0.08, 0.88
    s = np.array([[1.0, rho], [rho, 1.0]])
    q = s.copy()
    e_prev = np.zeros(A)
    s2 = np.full(A, omega / (1 - alpha - beta))
    eps_prev2 = s2.copy()
    out = np.empty((t_len, A))
    for t in range(t_len):
        q = (1 - a_c - b_c) * s + a_c * np.outer(e_prev, e_prev) + b_c * q
        qn = np.sqrt(np.diag(q))
        r_t = q / np.outer(qn, qn)
        e = np.linalg.cholesky(r_t + 1e-12 * np.eye(A)) @ rng.standard_normal(A)
        s2 = omega + 0.08 * eps_prev2 + 0.88 * s2
        eps = np.sqrt(s2) * e
        out[t] = 5e-4 + eps
        eps_prev2 = eps**2
        e_prev = e
    return out


def test_estimation_recovers_dcc_dynamics():
    """On synthetic DCC data (a=0.06, b=0.90) the two-step QMLE must find
    materially dynamic correlations near the truth; on CCC data (a=b=0) it
    must find (near-)zero news response."""
    r = _simulate_dcc_host(3000, 0.06, 0.90, seed=1)
    p = estimate_dcc_garch(r)
    assert 0.02 <= p.a_dcc <= 0.15
    assert 0.80 <= p.b_dcc <= 0.97
    assert 0.88 <= p.a_dcc + p.b_dcc <= 0.995

    r0 = _simulate_dcc_host(3000, 0.0, 0.0, seed=2)   # constant correlation
    p0 = estimate_dcc_garch(r0)
    assert p0.a_dcc <= 0.03


def test_degenerates_to_ccc_law():
    """a=b=0 freezes R_t = S: terminal law must match the CCC simulator with
    the same univariate parameters (different streams, same distribution)."""
    rho = 0.5
    corr = np.array([[1.0, rho], [rho, 1.0]])
    base = CCCGarchParams(
        mu=np.full(A, 5e-4), omega=np.full(A, 2e-6),
        alpha=np.full(A, 0.08), beta=np.full(A, 0.88),
        corr_chol=np.linalg.cholesky(corr),
        sigma2_0=np.full(A, 1e-4), eps2_0=np.full(A, 1e-4),
    )
    p = DCCGarchParams(base=base, a_dcc=0.0, b_dcc=0.0, q0=corr,
                       e0=np.zeros(A))
    n, steps = 32_768, 16
    term_d = np.asarray(dcc_terminal_returns(jax.random.key(0), p, n, steps))
    term_c = np.asarray(garch_terminal_returns(jax.random.key(1), base, n, steps))
    se = term_c.std(0) / np.sqrt(n)
    np.testing.assert_allclose(term_d.mean(0), term_c.mean(0), atol=6 * se.max())
    np.testing.assert_allclose(term_d.std(0), term_c.std(0), rtol=0.05)
    # cross-asset terminal correlation matches too
    cd = np.corrcoef(term_d, rowvar=False)[0, 1]
    cc = np.corrcoef(term_c, rowvar=False)[0, 1]
    assert abs(cd - cc) < 0.05


def test_dynamic_corr_fattens_joint_tail():
    """With a+b near 1 and a meaningful news term, correlated crashes cluster:
    the equal-weight portfolio's deep tail must be at least as bad as the
    frozen-correlation (a=b=0) version of the same parameters."""
    rho = 0.3
    corr = np.array([[1.0, rho], [rho, 1.0]])
    base = CCCGarchParams(
        mu=np.full(A, 5e-4), omega=np.full(A, 2e-6),
        alpha=np.full(A, 0.10), beta=np.full(A, 0.85),
        corr_chol=np.linalg.cholesky(corr),
        sigma2_0=np.full(A, 2e-4), eps2_0=np.full(A, 2e-4),
    )
    w = np.full(A, 0.5)
    dyn = DCCGarchParams(base=base, a_dcc=0.15, b_dcc=0.80, q0=corr,
                         e0=np.zeros(A))
    frz = DCCGarchParams(base=base, a_dcc=0.0, b_dcc=0.0, q0=corr,
                         e0=np.zeros(A))
    v_d, c_d, _ = dcc_risk(jax.random.key(3), dyn, w, n_paths=65_536,
                           n_steps=26, alpha=0.99)
    v_f, c_f, _ = dcc_risk(jax.random.key(3), frz, w, n_paths=65_536,
                           n_steps=26, alpha=0.99)
    assert c_d <= v_d < 0.0 and c_f <= v_f < 0.0
    assert c_d <= c_f + 0.005        # dynamic correlations do not THIN the tail


def test_risk_coherent_on_fitted_params():
    r = _simulate_dcc_host(800, 0.05, 0.90, seed=3)
    p = estimate_dcc_garch(r)
    v, c, m = dcc_risk(jax.random.key(0), p, np.full(A, 0.5),
                       n_paths=16_384, n_steps=12)
    assert c <= v < 0.0 < 1.0
    assert np.isfinite(m)


def test_unrolled_correlate_matches_lax_cholesky():
    """The unrolled Cholesky-Banachiewicz (path-batch vector axis) must equal
    normalize->cholesky->matvec through lax to float tolerance."""
    from mcport.models.dcc import _correlate_unrolled

    rng = np.random.default_rng(0)
    n, a = 64, 6
    base = rng.standard_normal((n, a, a))
    q = np.einsum("nij,nkj->nik", base, base) / a + 0.5 * np.eye(a)
    z = rng.standard_normal((n, a)).astype(np.float32)
    q32 = jnp.asarray(q, jnp.float32)

    got = np.asarray(_correlate_unrolled(q32, jnp.asarray(z)))
    qn = np.sqrt(np.einsum("njj->nj", q))
    r = q / np.einsum("ni,nj->nij", qn, qn)
    # reference applies the same guards as the unrolled form
    r = r + 1e-6 * np.eye(a)
    want = np.einsum("nij,nj->ni", np.linalg.cholesky(r), z)
    np.testing.assert_allclose(got, want, atol=5e-5)
