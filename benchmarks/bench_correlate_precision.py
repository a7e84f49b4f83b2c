"""Same-process A/B: cost of exact-f32 correlate dots in the step-loop kernels.

mcport pins the per-step Cholesky/correlation matmul to float32 contract
precision (pallas_gbm.CORRELATE_PRECISION): the TPU default would truncate
the factor to single-pass bf16 operands — a deterministic ~4e-3 relative
covariance bias. This measures what that correctness costs, by monkeypatching
the module constant and clearing the jit caches between alternations.

    python benchmarks/bench_correlate_precision.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import mcport  # noqa: F401

N_ASSETS = 15
N_STEPS = 252
N_PATHS = 1_048_576


def main():
    import jax
    import jax.numpy as jnp

    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops import pallas_garch, pallas_gbm
    from mcport.utils.profiling import diff_timed

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return

    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)
    mean = rng.normal(1e-3, 5e-4, N_ASSETS).astype(np.float32)
    w = rng.dirichlet(np.ones(N_ASSETS)).astype(np.float32)
    gp = CCCGarchParams(
        mu=np.full(N_ASSETS, 5e-4, np.float32),
        omega=np.full(N_ASSETS, 1e-5, np.float32),
        alpha=np.full(N_ASSETS, 0.08, np.float32),
        beta=np.full(N_ASSETS, 0.9, np.float32),
        corr_chol=np.linalg.cholesky(corr).astype(np.float32),
        sigma2_0=np.full(N_ASSETS, 5e-4, np.float32),
        eps2_0=np.full(N_ASSETS, 5e-4, np.float32),
    )

    def measure():
        @jax.jit
        def ps_one(seed):
            _, ret, dd = pallas_gbm.gbm_path_stats(seed, mean, chol, w,
                                                   N_PATHS, N_STEPS)
            return (jnp.sum(ret) + jnp.sum(dd)) * 1e-9

        @jax.jit
        def g_one(seed):
            return jnp.sum(pallas_garch.pallas_garch_terminal_returns(
                seed, gp, N_PATHS, N_STEPS)) * 1e-9

        out = {}
        for name, one in (("path-stats", ps_one), ("garch", g_one)):
            def loop(k, one=one):
                acc = jnp.float32(0)
                for i in range(k):
                    acc = acc + one(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
                return acc
            out[name] = N_PATHS * N_STEPS / diff_timed(loop, k=3) / 1e9
        return out

    saved = pallas_gbm.CORRELATE_PRECISION
    try:
        for prec in ("float32", "split", "bfloat16", "split"):
            pallas_gbm.CORRELATE_PRECISION = prec
            pallas_gbm.gbm_path_stats.clear_cache()
            pallas_garch._call.clear_cache()
            r = measure()
            print(f"  correlate={prec:9s}: path-stats {r['path-stats']:.2f}e9, "
                  f"garch {r['garch']:.2f}e9 path-steps/s")
    finally:
        # restore the module default ("split") for anything importing this
        # script after main() — as test_correlate_split_semantics does
        pallas_gbm.CORRELATE_PRECISION = saved
        pallas_gbm.gbm_path_stats.clear_cache()
        pallas_garch._call.clear_cache()


if __name__ == "__main__":
    main()
