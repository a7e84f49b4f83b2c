"""Heston kernel unroll A/B + throughput (VERDICT r4 item 1, round 5).

The Heston kernels launched in late round 4 with ``unroll=2`` "pending the
hardware A/B"; this closes that: same-process difference timing at the repo
protocol (k=16 windows, best of 3) over the terminal kernel (1M paths x 252
steps — two normal fields per step, so the PRNG draw rate per path-step is
2x GBM's) and the candidate path-stats kernel (256 cand x 131072 paths x
252 steps). Results → RESULTS.md Heston section; winning defaults → the
kernel signatures.

    python benchmarks/bench_heston.py
"""

import sys
import time
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

    from mcport.models.heston import HestonParams
    from mcport.ops.pallas_heston import (
        pallas_heston_path_stats,
        pallas_heston_terminal_returns,
    )
    from mcport.utils.profiling import diff_timed, seed_chain

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return

    rng = np.random.default_rng(0)
    hp = HestonParams(
        mu=rng.normal(1e-3, 5e-4, N_ASSETS), kappa=np.full(N_ASSETS, 0.15),
        theta=np.full(N_ASSETS, 4e-4), xi=np.full(N_ASSETS, 3e-3),
        rho=np.full(N_ASSETS, -0.5), v0=np.full(N_ASSETS, 4e-4),
        corr_chol=np.linalg.cholesky(0.5 * np.eye(N_ASSETS) + 0.5),
        s0=np.full(N_ASSETS, 100.0))
    cand = rng.dirichlet(np.ones(N_ASSETS), N_CAND).astype(np.float32)

    chain = seed_chain

    float(jnp.zeros(()).sum())     # warm the transfer path

    print("terminal (1M paths x 252 steps):", flush=True)
    for unroll in (1, 2, 4):
        @jax.jit
        def one(seed, unroll=unroll):
            return pallas_heston_terminal_returns(
                seed, hp, N_PATHS, N_STEPS, unroll=unroll).sum() * 1e-9

        t0 = time.perf_counter()
        float(one(jnp.int32(0)))
        wall = time.perf_counter() - t0
        rate = N_PATHS * N_STEPS / diff_timed(chain(one), k=16, trials=3)
        print(f"  unroll={unroll}: {rate/1e9:6.2f}e9 path-steps/s "
              f"(first call {wall:.1f}s)", flush=True)

    total = N_CAND * DD_PATHS * N_STEPS
    print(f"path-stats ({N_CAND} cand x {DD_PATHS} paths x {N_STEPS} steps):",
          flush=True)
    for unroll in (1, 2, 4):
        @jax.jit
        def one(seed, unroll=unroll):
            t, d = pallas_heston_path_stats(
                seed, hp, cand, DD_PATHS, N_STEPS, unroll=unroll)
            return (t.sum() + d.sum()) * 1e-9

        t0 = time.perf_counter()
        float(one(jnp.int32(0)))
        wall = time.perf_counter() - t0
        rate = total / diff_timed(chain(one), k=16, trials=3)
        print(f"  unroll={unroll}: {rate/1e9:6.1f}e9 cand-path-steps/s "
              f"(first call {wall:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
