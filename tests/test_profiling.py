"""Observability: profiler trace capture and XLA cost analysis produce artifacts."""

import jax.numpy as jnp
import numpy as np

from mcport.utils.profiling import cost_analysis, timed, trace


def test_trace_writes_artifacts(tmp_path):
    logdir = tmp_path / "tb"
    with trace(str(logdir)):
        x = jnp.ones((256, 256))
        (x @ x).block_until_ready()
    files = list(logdir.rglob("*"))
    assert any(f.is_file() for f in files), "no trace artifacts written"


def test_cost_analysis_flops():
    ca = cost_analysis(lambda a, b: a @ b, jnp.ones((64, 32)), jnp.ones((32, 16)))
    # 2*M*N*K = 2*64*16*32 = 65536 flops
    assert ca.get("flops", 0) >= 2 * 64 * 16 * 32 * 0.9


def test_timed_positive():
    assert timed(lambda: jnp.arange(1000.0).sum(), reps=3) > 0


def test_seed_chain_distinct_seeds_and_dependence():
    """seed_chain feeds rep i the seed 1+i (distinct PRNG streams) while
    chaining each rep's output into the next seed's data dependence; the
    loop total is exactly sum(one(1+i)) because the chained term is 0."""
    import jax

    @jax.jit
    def one(seed):
        return jnp.float32(seed) * 2.0

    from mcport.utils.profiling import diff_timed, seed_chain

    loop = seed_chain(one)
    out = float(loop(4))
    np.testing.assert_allclose(out, sum(2.0 * (1 + i) for i in range(4)))
    assert diff_timed(seed_chain(one), k=2, trials=1) > 0
