"""multi-dd unroll 2-vs-4 across the scoring tiers (round 5 follow-up).

The round-5 A/B that flipped the multi-dd default to unroll=4 measured the
f32 tier only (+5.6%, bench_dd_unroll.py). The default applies to every
score_dtype and to the rebalanced/hedged recursions too — they share the
Box-Muller draw loop the unroll regroups — so this confirms none of them
regress under the new default. Same process, k=16 + best-of-3, stream
identity asserted per tier.

    python benchmarks/bench_dd_unroll_tiers.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks._ab_common import K, TRIALS, ab_rate, require_tpu, universe

N_ASSETS = 15
N_PATHS = 131_072
N_STEPS = 252
W = 256


def main():
    import jax
    import jax.numpy as jnp

    from mcport.ops.pallas_multi_dd import gbm_multi_portfolio_dd

    if not require_tpu():
        return

    rng, corr, chol, mean = universe(N_ASSETS)
    cand = rng.dirichlet(np.ones(N_ASSETS), W).astype(np.float32)

    from mcport.options import HedgeSpec, LegType, Legs

    protected = HedgeSpec.build(
        {i: Legs.from_rows([(LegType.BUY_ASSET, 0.0, 0.0, 1.0),
                            (LegType.BUY_PUT, 90.0, 2.0, 1.0)])
         for i in range(N_ASSETS)},
        [f"a{i}" for i in range(N_ASSETS)])
    hedge = (jnp.full(N_ASSETS, 100.0, jnp.float32), *protected.arrays)

    rate = ab_rate

    tiers = [
        ("tf32", dict(score_dtype="tensorfloat32")),
        ("bf16", dict(score_dtype="bfloat16")),
        ("rebalance f32", dict(rebalance=True)),
        ("hedged f32", dict(hedge_args=hedge)),
    ]
    print(f"multi-dd tiers (W={W}, {N_PATHS} paths, {N_STEPS} steps), "
          f"cand-path-steps/s, k={K} best-of-{TRIALS}:")
    for label, kw in tiers:
        outs = {}
        for unroll in (2, 4):
            @jax.jit
            def one(seed, u=unroll, kw=kw):
                t, dd = gbm_multi_portfolio_dd(seed, mean, chol, cand,
                                               N_PATHS, N_STEPS, unroll=u,
                                               **kw)
                return (t.sum() + dd.sum()) * 1e-9

            outs[unroll] = gbm_multi_portfolio_dd(
                jnp.int32(7), mean, chol, cand, N_PATHS, N_STEPS,
                unroll=unroll, **kw)
            print(f"  {label:14s} unroll={unroll}: "
                  f"{rate(one, W * N_PATHS * N_STEPS):6.1f}e9", flush=True)
        # bf16 compounding accumulates operand rounding; identity there is
        # about the draw stream, checked at the tier's own noise scale
        tol = 3e-2 if "bf16" in label else 2e-5
        for g, r in zip(outs[4], outs[2]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=tol, atol=tol)
        print(f"  {label:14s} stream identity 2 vs 4: OK ({tol:g})")


if __name__ == "__main__":
    main()
