"""Same-process A/B: f32 vs bf16 candidate-scoring matmul in the
multi-portfolio drawdown kernel.

score_dtype="bfloat16" halves the MXU operand width of the per-step
(w_pad, a_pad) x (a_pad, block) candidate-value matmul (f32 accumulation;
terminal returns stay exact f32). Reps here are sized ~100 ms (256 cand x
131,072 paths x 252 steps) so the tunnel noise floor — which drowns the
smaller bench_prefetch multi-dd config — cancels in the K-vs-2K difference.

    python benchmarks/bench_multi_dd_bf16.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_ASSETS = 15
N_CAND = 256
N_PATHS = 131_072
N_STEPS = 252


def main():
    import jax
    import jax.numpy as jnp

    from mcport.ops.pallas_multi_dd import gbm_multi_portfolio_dd
    from mcport.utils.profiling import diff_timed

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return

    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)
    mean = rng.normal(1e-3, 5e-4, N_ASSETS).astype(np.float32)
    W = rng.dirichlet(np.ones(N_ASSETS), size=N_CAND).astype(np.float32)

    for sd in ("float32", "tensorfloat32", "bfloat16"):
        @jax.jit
        def one(seed, sd=sd):
            term, dd = gbm_multi_portfolio_dd(seed, mean, chol, W, N_PATHS,
                                              N_STEPS, score_dtype=sd)
            return (jnp.sum(term) + jnp.sum(dd)) * 1e-9

        def loop(k, one=one):
            acc = jnp.float32(0)
            for i in range(k):
                acc = acc + one(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
            return acc

        sec = diff_timed(loop, k=4)
        rate = N_CAND * N_PATHS * N_STEPS / sec / 1e9
        print(f"  score_dtype={sd}: {rate:.1f}e9 cand-path-steps/s")


if __name__ == "__main__":
    main()
