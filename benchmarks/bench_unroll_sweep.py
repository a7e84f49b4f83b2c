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
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_ASSETS = 15
N_PATHS = 1_048_576
N_STEPS = 252
K = 16
TRIALS = 3


def main():
    import jax
    import jax.numpy as jnp

    from mcport.models.garch_mc import CCCGarchParams
    from mcport.models.heston import HestonParams
    from mcport.ops.pallas_garch import pallas_garch_terminal_returns
    from mcport.ops.pallas_gbm import pallas_terminal_log_returns
    from mcport.ops.pallas_heston import pallas_heston_terminal_returns
    from mcport.utils.profiling import diff_timed, seed_chain

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return

    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)
    mean = rng.normal(1e-3, 5e-4, N_ASSETS).astype(np.float32)
    w = jnp.asarray(rng.dirichlet(np.ones(N_ASSETS)), jnp.float32)

    sig0 = np.full(N_ASSETS, 4e-4)
    gp = CCCGarchParams(
        mu=np.asarray(mean, np.float64), omega=sig0 * 0.1,
        alpha=np.full(N_ASSETS, 0.08), beta=np.full(N_ASSETS, 0.9),
        corr_chol=np.linalg.cholesky(corr), sigma2_0=sig0, eps2_0=sig0)
    hp = HestonParams(
        mu=np.asarray(mean, np.float64), kappa=np.full(N_ASSETS, 0.15),
        theta=np.full(N_ASSETS, 4e-4), xi=np.full(N_ASSETS, 3e-3),
        rho=np.full(N_ASSETS, -0.5), v0=np.full(N_ASSETS, 4e-4),
        corr_chol=np.linalg.cholesky(corr), s0=np.full(N_ASSETS, 100.0))

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

    def measure(fn, u):
        @jax.jit
        def one(seed, u=u):
            return fn(seed, u)
        t0 = time.perf_counter()
        r = work / diff_timed(seed_chain(one), k=K, trials=TRIALS) / 1e9
        return r, time.perf_counter() - t0

    print(f"unroll sweep ({N_PATHS} paths, {N_STEPS} steps), "
          f"path-steps/s, k={K} best-of-{TRIALS}:")
    for name, fn, default, extra in cells:
        base, _ = measure(fn, default)
        print(f"  {name:9s} unroll={default:<2d}: {base:5.2f}e9 (default)",
              flush=True)
        for u in extra:
            r, wall = measure(fn, u)
            print(f"  {name:9s} unroll={u:<2d}: {r:5.2f}e9 "
                  f"({(r / base - 1) * 100:+.1f}%, compile+measure "
                  f"{wall:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
