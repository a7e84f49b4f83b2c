"""Terminal-kernel unroll A/B on the HEADLINE cell (poly, 15 assets, 252 steps).

The exact tier runs unroll=4 and the poly_fast screening tier unroll=8
(pallas_gbm.pallas_terminal_log_returns); this pins the exact tier's choice
with the round-4 measurement protocol (k=16 windows, max-of-3 interleaved
rounds — CLAUDE.md: between-window tunnel noise at k<=3 exceeds 20%).

    python benchmarks/bench_terminal_unroll.py
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

    from mcport.ops.pallas_gbm import gbm_terminal_noise
    from mcport.utils.profiling import diff_timed

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return

    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)

    def make(bm, unroll):
        @jax.jit
        def one(seed):
            return gbm_terminal_noise(seed, chol, N_PATHS, N_STEPS,
                                      bm=bm, unroll=unroll).sum() * 1e-9
        return one

    cfgs = {f"{bm} u{u}": make(bm, u)
            for bm in ("poly", "poly_fast") for u in (2, 4, 8)}

    def measure(one):
        def loop(k):
            acc = jnp.float32(0)
            for i in range(k):
                acc = acc + one(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
            return acc
        return N_PATHS * N_STEPS / diff_timed(loop, k=16) / 1e9

    hist = {n: [] for n in cfgs}
    for _ in range(3):
        for n, one in cfgs.items():
            hist[n].append(measure(one))
    for n, v in hist.items():
        runs = " ".join(f"{x:.2f}" for x in v)
        print(f"  {n}: max={max(v):.2f}e9 path-steps/s  (runs: {runs})")


if __name__ == "__main__":
    main()
