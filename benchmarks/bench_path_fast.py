"""Same-process A/B: "poly" vs "poly_fast" normal draws through the PATH tier.

Round 4 wired the screening-tier Box-Muller (degree-5 ln + degree-5/4
sincos, |Δz| <= ~1.5e-4 — pallas_gbm._boxmuller_poly_fast) beyond the
terminal kernel into gbm_path_stats and the multi-candidate drawdown
kernel. This measures what the halved FMA chain buys when the step loop
also carries drawdown state (path-stats) or a candidate scoring matmul
(multi-dd, where the MXU — not the VPU draw pipeline — is the roofline).

    python benchmarks/bench_path_fast.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_ASSETS = 15
N_PATHS = 1_048_576
N_STEPS = 252
N_CAND = 256
DD_PATHS = 131_072


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
    w1 = rng.dirichlet(np.ones(N_ASSETS)).astype(np.float32)
    W = rng.dirichlet(np.ones(N_ASSETS), size=N_CAND).astype(np.float32)

    print(f"path-stats: {N_PATHS} paths x {N_STEPS} steps, {N_ASSETS} assets")
    for bm in ("poly", "poly_fast"):
        @jax.jit
        def one(seed, bm=bm):
            _, port, dd = gbm_path_stats(seed, mean, chol, w1, N_PATHS,
                                         N_STEPS, bm=bm)
            return (jnp.sum(port) + jnp.sum(dd)) * 1e-9

        def loop(k, one=one):
            acc = jnp.float32(0)
            for i in range(k):
                acc = acc + one(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
            return acc

        sec = diff_timed(loop, k=4)
        rate = N_PATHS * N_STEPS / sec / 1e9
        print(f"  bm={bm}: {rate:.2f}e9 path-steps/s")

    print(f"multi-dd: {N_CAND} cand x {DD_PATHS} paths x {N_STEPS} steps")
    for sd in ("float32", "bfloat16"):
        for bm in ("poly", "poly_fast"):
            @jax.jit
            def one(seed, sd=sd, bm=bm):
                term, dd = gbm_multi_portfolio_dd(
                    seed, mean, chol, W, DD_PATHS, N_STEPS,
                    score_dtype=sd, bm=bm)
                return (jnp.sum(term) + jnp.sum(dd)) * 1e-9

            def loop(k, one=one):
                acc = jnp.float32(0)
                for i in range(k):
                    acc = acc + one(jnp.int32(1 + i)
                                    + (acc * 0).astype(jnp.int32))
                return acc

            sec = diff_timed(loop, k=4)
            rate = N_CAND * DD_PATHS * N_STEPS / sec / 1e9
            print(f"  score_dtype={sd} bm={bm}: {rate:.1f}e9 cand-path-steps/s")


if __name__ == "__main__":
    main()
