"""Intermediate unroll cells for the terminal kernels (round 5 follow-up).

The round-5 u8 A/B (bench_terminal_u8.py) closed the 4-vs-8 matrix:
garch adopted 8 (+3.1%), gbm poly and heston stayed at 4 (u8 regressed
-2.2%/-1.2%). This sweep measures the cells BETWEEN and BEYOND those
points — gbm poly u6, heston u6 (is the optimum between 4 and 8?),
garch u12/u16 (is there headroom past 8?), poly_fast u16 (past the
round-4 adopted 8) — at the same k=16 + best-of-3 one-process protocol.
Unroll only regroups the counter-addressed draw loop (remainder steps
handled), so the stream is unchanged at any value; identity is pinned by
bench_terminal_u8.py --check and the kernel law tests.

    python benchmarks/bench_unroll_sweep.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks._ab_common import (K, TRIALS, garch_params, heston_params,
                                   measure_unroll, require_tpu, universe)

N_ASSETS = 15
N_PATHS = 1_048_576
N_STEPS = 252


def main():
    import jax.numpy as jnp

    from mcport.ops.pallas_garch import pallas_garch_terminal_returns
    from mcport.ops.pallas_gbm import pallas_terminal_log_returns
    from mcport.ops.pallas_heston import pallas_heston_terminal_returns

    if not require_tpu():
        return

    rng, corr, chol, mean = universe(N_ASSETS)
    w = jnp.asarray(rng.dirichlet(np.ones(N_ASSETS)), jnp.float32)
    gp = garch_params(mean, corr)
    hp = heston_params(mean, corr)

    def gbm(seed, u):
        t = pallas_terminal_log_returns(seed, mean, chol, N_PATHS, N_STEPS,
                                        unroll=u)
        return ((jnp.exp(t) - 1.0) @ w).sum() * 1e-9

    def gbm_fast(seed, u):
        t = pallas_terminal_log_returns(seed, mean, chol, N_PATHS, N_STEPS,
                                        bm="poly_fast", unroll=u)
        return ((jnp.exp(t) - 1.0) @ w).sum() * 1e-9

    def garch(seed, u):
        t = pallas_garch_terminal_returns(seed, gp, N_PATHS, N_STEPS,
                                          unroll=u)
        return (t @ w).sum() * 1e-9

    def heston(seed, u):
        t = pallas_heston_terminal_returns(seed, hp, N_PATHS, N_STEPS,
                                           unroll=u)
        return (t @ w).sum() * 1e-9

    # (name, fn, adopted default, candidate cells)
    cells = [
        ("gbm poly", gbm, 4, (6,)),
        ("heston", heston, 4, (6,)),
        ("garch", garch, 8, (12, 16)),
        ("poly_fast", gbm_fast, 8, (16,)),
    ]
    work = N_PATHS * N_STEPS

    print(f"unroll sweep ({N_PATHS} paths, {N_STEPS} steps), "
          f"path-steps/s, k={K} best-of-{TRIALS}:")
    for name, fn, default, extra in cells:
        base, _ = measure_unroll(fn, default, work)
        print(f"  {name:9s} unroll={default:<2d}: {base:5.2f}e9 (default)",
              flush=True)
        for u in extra:
            r, wall = measure_unroll(fn, u, work)
            print(f"  {name:9s} unroll={u:<2d}: {r:5.2f}e9 "
                  f"({(r / base - 1) * 100:+.1f}%, compile+measure "
                  f"{wall:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
