"""Kernel-fleet throughput after the f32-matmul-precision fix.

mcport forces float32 matmul precision process-wide (mcport/__init__.py): the
TPU default silently ran every f32 matmul with single-pass bf16 operands
(2.4e-3 relative error — measured, see RESULTS.md). This re-measures the
fleet under honest f32 contracts, plus the explicit-bf16 screening mode.

    python benchmarks/bench_precision_fleet.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import mcport  # noqa: F401  (sets float32 matmul precision)

N_ASSETS = 15
N_STEPS = 252
N_PATHS = 1_048_576


def main():
    import jax
    import jax.numpy as jnp

    from mcport.utils.profiling import diff_timed

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return

    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)
    mean = rng.normal(1e-3, 5e-4, N_ASSETS).astype(np.float32)
    w = rng.dirichlet(np.ones(N_ASSETS)).astype(np.float32)
    W = rng.dirichlet(np.ones(N_ASSETS), size=256).astype(np.float32)

    def chain_loop(one, k):
        def loop(kk, one=one):
            acc = jnp.float32(0)
            for i in range(kk):
                acc = acc + one(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
            return acc
        return diff_timed(loop, k=k)

    from mcport.ops.pallas_gbm import gbm_path_stats, pallas_terminal_log_returns

    @jax.jit
    def term_one(seed):
        return jnp.sum(pallas_terminal_log_returns(seed, mean, chol, N_PATHS,
                                                   N_STEPS)) * 1e-9
    sec = chain_loop(term_one, 3)
    print(f"terminal:        {N_PATHS*N_STEPS/sec/1e9:.2f}e9 path-steps/s")

    @jax.jit
    def ps_one(seed):
        _, ret, dd = gbm_path_stats(seed, mean, chol, w, N_PATHS, N_STEPS)
        return (jnp.sum(ret) + jnp.sum(dd)) * 1e-9
    sec = chain_loop(ps_one, 3)
    print(f"path-stats:      {N_PATHS*N_STEPS/sec/1e9:.2f}e9 path-steps/s")

    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops.pallas_garch import pallas_garch_terminal_returns

    gp = CCCGarchParams(
        mu=np.full(N_ASSETS, 5e-4, np.float32),
        omega=np.full(N_ASSETS, 1e-5, np.float32),
        alpha=np.full(N_ASSETS, 0.08, np.float32),
        beta=np.full(N_ASSETS, 0.9, np.float32),
        corr_chol=np.linalg.cholesky(corr).astype(np.float32),
        sigma2_0=np.full(N_ASSETS, 5e-4, np.float32),
        eps2_0=np.full(N_ASSETS, 5e-4, np.float32),
    )

    @jax.jit
    def g_one(seed):
        return jnp.sum(pallas_garch_terminal_returns(seed, gp, N_PATHS,
                                                     N_STEPS)) * 1e-9
    sec = chain_loop(g_one, 3)
    print(f"garch:           {N_PATHS*N_STEPS/sec/1e9:.2f}e9 path-steps/s")

    from mcport.ops.pallas_multi_dd import gbm_multi_portfolio_dd

    for sd in ("float32", "bfloat16"):
        @jax.jit
        def md_one(seed, sd=sd):
            t, d = gbm_multi_portfolio_dd(seed, mean, chol, W, 131_072, N_STEPS,
                                          score_dtype=sd)
            return (jnp.sum(t) + jnp.sum(d)) * 1e-9
        sec = chain_loop(md_one, 4)
        print(f"multi-dd {sd:9s}: {256*131_072*N_STEPS/sec/1e9:.1f}e9 cand-path-steps/s")

    from mcport.ops.pallas_bootstrap import pallas_bootstrap_terminal_returns

    hist = (rng.standard_t(5, (360, N_ASSETS)) * 0.02 + 0.002).astype(np.float32)

    @jax.jit
    def b_one(seed):
        return jnp.sum(pallas_bootstrap_terminal_returns(seed, hist, N_PATHS,
                                                         52)) * 1e-9
    sec = chain_loop(b_one, 4)
    print(f"bootstrap:       {N_PATHS*52/sec/1e9:.2f}e9 path-steps/s")


if __name__ == "__main__":
    main()
