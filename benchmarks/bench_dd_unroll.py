"""Candidate-dd kernel unroll A/B at the k=16 + best-of-3 protocol (round 5).

The heston-dd kernel gained +11% flipping unroll 2 -> 4 (RESULTS round 5);
multi-dd was only ever A/B'd 1 vs 2 (+17%, round 3) and the dcc tile dd
kernel ships unroll=2. This measures unroll {2, 4} on the production
multi-dd f32 kernel and {2, 4} on the dcc tile dd kernel, same process,
stream-identity asserted (unroll only regroups the draw loop).

unroll=8 on multi-dd is DISQUALIFIED, not just unmeasured: its Mosaic
compile did not finish in 37 minutes on the v5e (killed; unroll=2/4
compile in seconds) — a non-starter as a default regardless of runtime.

    python benchmarks/bench_dd_unroll.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_ASSETS = 15
N_PATHS = 131_072
N_STEPS = 252
W = 256
K = 16
TRIALS = 3


def main():
    import jax
    import jax.numpy as jnp

    from mcport.models.dcc import DCCGarchParams
    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops.pallas_dcc import pallas_dcc_path_stats
    from mcport.ops.pallas_multi_dd import gbm_multi_portfolio_dd
    from mcport.utils.profiling import diff_timed, seed_chain

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return

    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)
    mean = rng.normal(1e-3, 5e-4, N_ASSETS).astype(np.float32)
    cand = rng.dirichlet(np.ones(N_ASSETS), W).astype(np.float32)

    def rate(one, work):
        return work / diff_timed(seed_chain(one), k=K, trials=TRIALS) / 1e9

    print(f"multi-dd f32 (W={W}, {N_PATHS} paths, {N_STEPS} steps), "
          f"cand-path-steps/s, k={K} best-of-{TRIALS}:")
    outs = {}
    for unroll in (2, 4):
        @jax.jit
        def one(seed, u=unroll):
            t, dd = gbm_multi_portfolio_dd(seed, mean, chol, cand, N_PATHS,
                                           N_STEPS, unroll=u)
            return (t.sum() + dd.sum()) * 1e-9

        outs[unroll] = gbm_multi_portfolio_dd(
            jnp.int32(7), mean, chol, cand, N_PATHS, N_STEPS, unroll=unroll)
        print(f"  unroll={unroll}: "
              f"{rate(one, W * N_PATHS * N_STEPS):6.1f}e9")
    for g, r in zip(outs[4], outs[2]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)
    print("  stream identity 2 vs 4: OK (2e-5)")

    sig0 = np.full(N_ASSETS, 4e-4)
    gp = CCCGarchParams(
        mu=np.asarray(mean, np.float64), omega=sig0 * 0.1,
        alpha=np.full(N_ASSETS, 0.08), beta=np.full(N_ASSETS, 0.9),
        corr_chol=np.linalg.cholesky(corr), sigma2_0=sig0, eps2_0=sig0)
    dp = DCCGarchParams(base=gp, a_dcc=0.08, b_dcc=0.85, q0=corr,
                        e0=np.zeros(N_ASSETS))
    dcc_steps = 52

    print(f"dcc-dd tile (W={W}, {N_PATHS} paths, {dcc_steps} steps), "
          f"cand-path-steps/s, k={K} best-of-{TRIALS}:")
    douts = {}
    for unroll in (2, 4):
        @jax.jit
        def one(seed, u=unroll):
            t, dd = pallas_dcc_path_stats(seed, dp, cand, N_PATHS, dcc_steps,
                                          unroll=u)
            return (t.sum() + dd.sum()) * 1e-9

        douts[unroll] = pallas_dcc_path_stats(
            jnp.int32(7), dp, cand, N_PATHS, dcc_steps, unroll=unroll)
        print(f"  unroll={unroll}: "
              f"{rate(one, W * N_PATHS * dcc_steps):6.1f}e9")
    for g, r in zip(douts[4], douts[2]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)
    print("  stream identity 2 vs 4: OK (2e-5)")


if __name__ == "__main__":
    main()
