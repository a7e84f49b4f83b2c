"""Risk-based allocators (engine.risk_parity): ERC property, budgets, HRP."""

import numpy as np
import pytest

from mcport.engine.risk_parity import (
    hierarchical_risk_parity,
    inverse_variance,
    risk_contributions,
    risk_parity,
)


def _rand_cov(a, seed=0, corr_strength=0.5):
    rng = np.random.default_rng(seed)
    vol = rng.uniform(0.1, 0.6, a)
    z = rng.standard_normal((a, a + 8))
    c = z @ z.T
    d = np.sqrt(np.diagonal(c))
    corr = corr_strength * (c / np.outer(d, d)) + (1 - corr_strength) * np.eye(a)
    return corr * np.outer(vol, vol)


def test_erc_equalizes_risk_contributions():
    cov = _rand_cov(8, seed=1)
    w = risk_parity(cov)
    rc = risk_contributions(w, cov)
    np.testing.assert_allclose(rc, 1.0 / 8, atol=1e-8)
    assert w.sum() == pytest.approx(1.0) and (w > 0).all()


def test_custom_budgets_respected():
    cov = _rand_cov(5, seed=2)
    b = np.array([4.0, 2.0, 1.0, 1.0, 2.0])
    w = risk_parity(cov, budgets=b)
    rc = risk_contributions(w, cov)
    np.testing.assert_allclose(rc, b / b.sum(), atol=1e-8)


def test_diagonal_cov_closed_form():
    vol = np.array([0.1, 0.2, 0.4])
    cov = np.diag(vol**2)
    # ERC on a diagonal cov is inverse-vol
    np.testing.assert_allclose(risk_parity(cov), (1 / vol) / (1 / vol).sum(),
                               atol=1e-10)
    np.testing.assert_allclose(inverse_variance(cov),
                               (1 / vol**2) / (1 / vol**2).sum(), atol=1e-12)
    # uncorrelated HRP = inverse variance
    np.testing.assert_allclose(hierarchical_risk_parity(cov),
                               inverse_variance(cov), atol=1e-12)


def test_bad_inputs_raise():
    with pytest.raises(ValueError):
        risk_parity(np.ones((2, 3)))
    with pytest.raises(ValueError):
        risk_parity(np.eye(2), budgets=np.array([1.0, 0.0]))


def test_hrp_permutation_equivariant_and_sane():
    cov = _rand_cov(7, seed=3)
    w = hierarchical_risk_parity(cov)
    assert w.sum() == pytest.approx(1.0) and (w > 0).all()
    perm = np.random.default_rng(4).permutation(7)
    w_p = hierarchical_risk_parity(cov[np.ix_(perm, perm)])
    np.testing.assert_allclose(w_p, w[perm], atol=1e-12)
    # single asset trivially gets everything
    np.testing.assert_allclose(hierarchical_risk_parity(np.array([[0.04]])), [1.0])


def test_risk_parity_beats_concentration_under_stress():
    # two highly-correlated risky assets + one diversifier: ERC must put
    # meaningful weight on the diversifier
    corr = np.array([[1.0, 0.9, 0.1], [0.9, 1.0, 0.1], [0.1, 0.1, 1.0]])
    vol = np.array([0.3, 0.3, 0.3])
    cov = corr * np.outer(vol, vol)
    w = risk_parity(cov)
    assert w[2] > w[0] and w[2] > w[1]
    rc = risk_contributions(w, cov)
    np.testing.assert_allclose(rc, 1 / 3, atol=1e-8)
