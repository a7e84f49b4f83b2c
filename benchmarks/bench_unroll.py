"""Production-kernel unroll/prefetch matrix (round-3 roofline follow-up).

The roofline isolation kernels measured manual unroll=2 at +38% on the
path-stats chain; this A/Bs the PRODUCTION kernels (path-stats, GARCH,
multi-dd) over (prefetch, unroll) to pick defaults. Same-process
difference-timed.

    python benchmarks/bench_unroll.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_ASSETS = 15
N_PATHS = 1_048_576
N_STEPS = 252


def main():
    import jax
    import jax.numpy as jnp

    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops.pallas_garch import pallas_garch_terminal_returns
    from mcport.ops.pallas_gbm import gbm_path_stats
    from mcport.utils.profiling import diff_timed

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return

    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)
    mean = rng.normal(1e-3, 5e-4, N_ASSETS).astype(np.float32)
    w = rng.dirichlet(np.ones(N_ASSETS)).astype(np.float32)

    def rate(one, k=4):
        def loop(n):
            acc = jnp.float32(0)
            for i in range(n):
                acc = acc + one(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
            return acc
        return N_PATHS * N_STEPS / diff_timed(loop, k=k) / 1e9

    print("path-stats (Gpath-steps/s):")
    for prefetch, unroll in ((True, 1), (False, 1), (False, 2), (False, 4),
                             (True, 2)):
        @jax.jit
        def one(seed, p=prefetch, u=unroll):
            t, port, dd = gbm_path_stats(seed, mean, chol, w, N_PATHS, N_STEPS,
                                         prefetch=p, unroll=u)
            return (port.sum() + dd.sum()) * 1e-9

        print(f"  prefetch={prefetch!s:5} unroll={unroll}: {rate(one):6.2f}e9")

    sig0 = np.full(N_ASSETS, 4e-4)
    gp = CCCGarchParams(
        mu=np.asarray(mean, np.float64), omega=sig0 * 0.1,
        alpha=np.full(N_ASSETS, 0.08), beta=np.full(N_ASSETS, 0.9),
        corr_chol=np.linalg.cholesky(corr), sigma2_0=sig0, eps2_0=sig0)

    print("garch (Gpath-steps/s):")
    for prefetch, unroll in ((True, 1), (False, 2), (False, 4)):
        @jax.jit
        def one(seed, p=prefetch, u=unroll):
            return pallas_garch_terminal_returns(
                seed, gp, N_PATHS, N_STEPS, prefetch=p, unroll=u).sum() * 1e-9

        print(f"  prefetch={prefetch!s:5} unroll={unroll}: {rate(one):6.2f}e9")


if __name__ == "__main__":
    main()
