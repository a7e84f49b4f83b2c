"""Same-process A/B: draw-ahead software pipelining (prefetch=) in the
path-stats, multi-portfolio drawdown, and CCC-GARCH kernels.

The draw of iteration i+1 is independent of iteration i's dependent chain
(Cholesky matmul -> exp -> peak/divide); carrying it one iteration ahead lets
Mosaic overlap the PRNG + Box-Muller VPU polynomials with the EUP/MXU work.
Outputs are bit-identical (same stateful draw order); this script measures
whether the schedule actually overlaps. Run on the real chip:

    python benchmarks/bench_prefetch.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_ASSETS = 15
N_STEPS = 252
N_PATHS = 1_048_576
N_CAND = 256
N_PATHS_DD = 16_384
N_STEPS_DD = 52


def main():
    import jax
    import jax.numpy as jnp

    from mcport.ops.pallas_gbm import gbm_path_stats
    from mcport.ops.pallas_multi_dd import gbm_multi_portfolio_dd
    from mcport.utils.profiling import diff_timed

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return

    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)
    mean = rng.normal(1e-3, 5e-4, N_ASSETS).astype(np.float32)
    w = rng.dirichlet(np.ones(N_ASSETS)).astype(np.float32)
    W = rng.dirichlet(np.ones(N_ASSETS), size=N_CAND).astype(np.float32)

    print("== path-stats kernel (per-step Cholesky + drawdown) ==")
    for prefetch in (False, True, False, True):
        @jax.jit
        def one(seed, prefetch=prefetch):
            _, ret, dd = gbm_path_stats(seed, mean, chol, w, N_PATHS, N_STEPS,
                                        prefetch=prefetch)
            return (jnp.sum(ret) + jnp.sum(dd)) * 1e-9

        def loop(k, one=one):
            acc = jnp.float32(0)
            for i in range(k):
                acc = acc + one(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
            return acc

        sec = diff_timed(loop, k=3)
        print(f"  prefetch={prefetch}: {N_PATHS * N_STEPS / sec / 1e9:.2f}e9 path-steps/s")

    print("== multi-portfolio drawdown kernel (W=256) ==")
    for prefetch in (False, True, False, True):
        @jax.jit
        def one(seed, prefetch=prefetch):
            term, dd = gbm_multi_portfolio_dd(seed, mean, chol, W, N_PATHS_DD,
                                              N_STEPS_DD, prefetch=prefetch)
            return (jnp.sum(term) + jnp.sum(dd)) * 1e-9

        def loop(k, one=one):
            acc = jnp.float32(0)
            for i in range(k):
                acc = acc + one(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
            return acc

        sec = diff_timed(loop, k=8)
        rate = N_CAND * N_PATHS_DD * N_STEPS_DD / sec / 1e9
        print(f"  prefetch={prefetch}: {rate:.1f}e9 cand-path-steps/s")

    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops.pallas_garch import pallas_garch_terminal_returns

    a = N_ASSETS
    garch = CCCGarchParams(
        mu=np.full(a, 5e-4, np.float32),
        omega=np.full(a, 1e-5, np.float32),
        alpha=np.full(a, 0.08, np.float32),
        beta=np.full(a, 0.9, np.float32),
        corr_chol=np.linalg.cholesky(corr).astype(np.float32),
        sigma2_0=np.full(a, 5e-4, np.float32),
        eps2_0=np.full(a, 5e-4, np.float32),
    )
    print("== CCC-GARCH terminal kernel ==")
    for prefetch in (False, True, False, True):
        @jax.jit
        def one(seed, prefetch=prefetch):
            out = pallas_garch_terminal_returns(seed, garch, N_PATHS, N_STEPS,
                                                prefetch=prefetch)
            return jnp.sum(out) * 1e-9

        def loop(k, one=one):
            acc = jnp.float32(0)
            for i in range(k):
                acc = acc + one(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
            return acc

        sec = diff_timed(loop, k=3)
        print(f"  prefetch={prefetch}: {N_PATHS * N_STEPS / sec / 1e9:.2f}e9 path-steps/s")


if __name__ == "__main__":
    main()
