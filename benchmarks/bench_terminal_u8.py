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

    print(f"terminal kernels ({N_PATHS} paths, {N_STEPS} steps), "
          f"path-steps/s, k={K} best-of-{TRIALS}:")
    base = {}
    for name, fn in kernels:
        base[name], _ = measure_unroll(fn, 4, work)
        print(f"  {name:9s} unroll=4: {base[name]:5.2f}e9", flush=True)
    for name, fn in kernels:
        r8, wall = measure_unroll(fn, 8, work)
        print(f"  {name:9s} unroll=8: {r8:5.2f}e9 "
              f"({(r8 / base[name] - 1) * 100:+.1f}%, compile+measure "
              f"{wall:.0f}s)", flush=True)


def _check(u_list=(4, 8)):
    """Interpret-mode stream identity for the three kernels (CPU)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mcport.ops.pallas_garch import pallas_garch_terminal_returns
    from mcport.ops.pallas_gbm import pallas_terminal_log_returns
    from mcport.ops.pallas_heston import pallas_heston_terminal_returns

    _, corr, chol, mean = universe(4)
    gp = garch_params(mean, corr)
    hp = heston_params(mean, corr)
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
