"""Roofline experiment: Box-Muller variants in the terminal GBM kernel (TPU).

Round-1 analysis pinned the terminal kernel at ~3.9e9 path-steps/s,
transcendental-bound on the EUP (log/sqrt/cos/sin per normal pair). This script
measures the variants in ops/pallas_gbm._BM_VARIANTS with the K-vs-2K difference
protocol and prints a table; run on the real chip:

    python benchmarks/bench_kernel_variants.py

Variants:
- exact: r cos(theta), r sin(theta) — 4 EUP ops / pair (round-1 baseline)
- sqrtsin: sin from ±sqrt(1 - cos^2) — 3 EUP ops + 1 sqrt / pair
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_ASSETS = 15
N_STEPS = 252
N_PATHS = 1_048_576


def main():
    import jax
    import jax.numpy as jnp

    from mcport.ops.pallas_gbm import _BM_VARIANTS, pallas_terminal_log_returns
    from mcport.utils.profiling import diff_timed

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return

    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)
    mean = rng.normal(1e-3, 5e-4, N_ASSETS).astype(np.float32)

    results = {}
    for bm in _BM_VARIANTS:
        @jax.jit
        def one(seed, bm=bm):
            from mcport.ops.pallas_gbm import gbm_terminal_noise
            noise = gbm_terminal_noise(seed, chol, N_PATHS, N_STEPS, bm=bm)
            return jnp.sum(noise) * 1e-9

        def loop(k, one=one):
            acc = jnp.float32(0)
            s = jnp.int32(1)
            for i in range(k):
                acc = acc + one(s + jnp.int32(i) + (acc * 0).astype(jnp.int32))
            return acc

        sec = diff_timed(loop, k=3)
        tput = N_PATHS * N_STEPS / sec
        results[bm] = tput
        print(f"{bm:10s} {tput/1e9:6.2f}e9 path-steps/s")

    base = results.get("exact")
    for bm, t in results.items():
        if bm != "exact" and base:
            print(f"{bm}: {t/base:.3f}x vs exact")


if __name__ == "__main__":
    main()
