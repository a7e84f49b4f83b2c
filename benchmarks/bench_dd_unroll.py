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

from benchmarks._ab_common import (K, TRIALS, ab_rate, dcc_params,
                                   garch_params, require_tpu, universe)

N_ASSETS = 15
N_PATHS = 131_072
N_STEPS = 252
W = 256


def main():
    import jax
    import jax.numpy as jnp

    from mcport.ops.pallas_dcc import pallas_dcc_path_stats
    from mcport.ops.pallas_multi_dd import gbm_multi_portfolio_dd

    if not require_tpu():
        return

    rng, corr, chol, mean = universe(N_ASSETS)
    cand = rng.dirichlet(np.ones(N_ASSETS), W).astype(np.float32)

    rate = ab_rate

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

    dp = dcc_params(garch_params(mean, corr), corr, N_ASSETS)
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
