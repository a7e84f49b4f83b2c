"""jit+NamedSharding search equals the unsharded computation exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.engine.weight_search import evaluate_portfolios
from mcport.ops.dirichlet import sample_constrained_weights
from mcport.parallel import make_mesh
from mcport.parallel.auto_sharded import auto_sharded_weight_search

A = 4


@pytest.fixture(scope="module")
def market(rng):
    rets = rng.normal(0.01, 0.05, (80, A)).astype(np.float32)
    return rets, rets.mean(0) * 12, (np.cov(rets, rowvar=False, ddof=1) * 12).astype(np.float32)


def test_matches_unsharded_exactly(market, eight_devices):
    rets, mu, sigma = market
    mesh = make_mesh(eight_devices)
    key = jax.random.key(0)
    w_star, m_star = auto_sharded_weight_search(
        key, rets, mu, sigma, 4096, mesh,
        np.zeros(A, np.float32), np.ones(A, np.float32), risk_free=0.03,
    )
    # unsharded replay of the same draws
    w, valid = sample_constrained_weights(key, 4096, jnp.zeros(A), jnp.ones(A))
    ev = evaluate_portfolios(w.astype(jnp.float32), rets, mu, sigma, 0.03)
    metric = np.where(np.asarray(valid), np.asarray(ev.sharpe), -np.inf)
    i = int(np.argmax(metric))
    assert m_star == pytest.approx(float(metric[i]), rel=1e-6)
    np.testing.assert_allclose(w_star, np.asarray(w)[i], atol=1e-7)


def test_indivisible_raises(market, eight_devices):
    rets, mu, sigma = market
    mesh = make_mesh(eight_devices)
    with pytest.raises(ValueError):
        auto_sharded_weight_search(
            jax.random.key(0), rets, mu, sigma, 1001, mesh,
            np.zeros(A, np.float32), np.ones(A, np.float32),
        )
