"""Terminal-kernel unroll=8 A/B: poly GBM, CCC-GARCH, Heston (round 5).

The poly_fast screening tier adopted unroll=8 in round 4 (9.9 -> 11.9e9),
but the EXACT-fidelity poly terminal kernel, the GARCH terminal kernel and
the Heston terminal kernel all default to unroll=4 without a measured u8
cell. This closes them at the k=16 + best-of-3 protocol, one process,
stream identity asserted (unroll only regroups the draw loop).

u4 baselines print first, then each u8 candidate — if a Mosaic compile
blows up (the multi-dd u8 failure mode) the baselines are already on
record and the hang identifies the guilty kernel.

    python benchmarks/bench_terminal_u8.py
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

    def garch(seed, u):
        t = pallas_garch_terminal_returns(seed, gp, N_PATHS, N_STEPS,
                                          unroll=u)
        return (t @ w).sum() * 1e-9

    def heston(seed, u):
        t = pallas_heston_terminal_returns(seed, hp, N_PATHS, N_STEPS,
                                           unroll=u)
        return (t @ w).sum() * 1e-9

    kernels = [("gbm poly", gbm), ("garch", garch), ("heston", heston)]
    work = N_PATHS * N_STEPS

    def measure(fn, u):
        @jax.jit
        def one(seed, u=u):
            return fn(seed, u)
        t0 = time.perf_counter()
        r = work / diff_timed(seed_chain(one), k=K, trials=TRIALS) / 1e9
        return r, time.perf_counter() - t0

    print(f"terminal kernels ({N_PATHS} paths, {N_STEPS} steps), "
          f"path-steps/s, k={K} best-of-{TRIALS}:")
    base = {}
    for name, fn in kernels:
        base[name], _ = measure(fn, 4)
        print(f"  {name:9s} unroll=4: {base[name]:5.2f}e9", flush=True)
    for name, fn in kernels:
        r8, wall = measure(fn, 8)
        print(f"  {name:9s} unroll=8: {r8:5.2f}e9 "
              f"({(r8 / base[name] - 1) * 100:+.1f}%, compile+measure "
              f"{wall:.0f}s)", flush=True)


def _check(u_list=(4, 8)):
    """Interpret-mode stream identity for the three kernels (CPU)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mcport.models.garch_mc import CCCGarchParams
    from mcport.models.heston import HestonParams
    from mcport.ops.pallas_garch import pallas_garch_terminal_returns
    from mcport.ops.pallas_gbm import pallas_terminal_log_returns
    from mcport.ops.pallas_heston import pallas_heston_terminal_returns

    rng = np.random.default_rng(0)
    a = 4
    corr = 0.5 * np.eye(a) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)
    mean = rng.normal(1e-3, 5e-4, a).astype(np.float32)
    sig0 = np.full(a, 4e-4)
    gp = CCCGarchParams(mu=np.asarray(mean, np.float64), omega=sig0 * 0.1,
                        alpha=np.full(a, 0.08), beta=np.full(a, 0.9),
                        corr_chol=np.linalg.cholesky(corr), sigma2_0=sig0,
                        eps2_0=sig0)
    hp = HestonParams(mu=np.asarray(mean, np.float64),
                      kappa=np.full(a, 0.15), theta=np.full(a, 4e-4),
                      xi=np.full(a, 3e-3), rho=np.full(a, -0.5),
                      v0=np.full(a, 4e-4), corr_chol=np.linalg.cholesky(corr),
                      s0=np.full(a, 100.0))
    for steps in (13, 16):
        outs = [np.asarray(pallas_terminal_log_returns(
            jnp.int32(7), mean, chol, 256, steps, unroll=u, interpret=True))
            for u in u_list]
        np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-5)
        outs = [np.asarray(pallas_garch_terminal_returns(
            jnp.int32(7), gp, 256, steps, unroll=u, interpret=True))
            for u in u_list]
        np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-5)
        outs = [np.asarray(pallas_heston_terminal_returns(
            jnp.int32(7), hp, 256, steps, unroll=u,
            interpret=True)) for u in u_list]
        np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-5)
    print("stream identity u4 vs u8 (interpret, odd+even steps): OK")


if __name__ == "__main__":
    if "--check" in sys.argv:
        _check()
    else:
        main()
