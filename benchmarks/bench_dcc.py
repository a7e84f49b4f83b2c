"""DCC kernel vs lax scan: first-compile wall and throughput (VERDICT r2 #2).

Targets: <=30 s first compile, >=0.5e9 path-steps/s (vs the lax scan's
~4-minute compile and 0.13e9 on the v5e). Same-process A/B; difference-timing
protocol for the throughput numbers.

    python benchmarks/bench_dcc.py [--lax]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_ASSETS = 15
N_PATHS = 1_048_576
N_STEPS = 52


def main():
    import jax
    import jax.numpy as jnp

    from mcport.models.dcc import DCCGarchParams, _dcc_simulate
    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops.pallas_dcc import pallas_dcc_terminal_returns
    from mcport.utils.profiling import diff_timed

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return

    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    sig0 = np.full(N_ASSETS, 4e-4)
    base = CCCGarchParams(
        mu=rng.normal(1e-3, 5e-4, N_ASSETS),
        omega=sig0 * 0.1, alpha=np.full(N_ASSETS, 0.08),
        beta=np.full(N_ASSETS, 0.9),
        corr_chol=np.linalg.cholesky(corr),
        sigma2_0=sig0, eps2_0=sig0,
    )
    params = DCCGarchParams(base=base, a_dcc=0.05, b_dcc=0.9,
                            q0=corr, e0=np.zeros(N_ASSETS))

    # first-compile wall (fresh process => fresh cache for this shape)
    t0 = time.perf_counter()
    out = pallas_dcc_terminal_returns(7, params, N_PATHS, N_STEPS)
    first = float(out.sum())  # value fetch = true completion
    t_compile = time.perf_counter() - t0
    print(f"  pallas first call (compile + run + fetch): {t_compile:.1f} s")

    def one(seed):
        return pallas_dcc_terminal_returns(seed, params, N_PATHS, N_STEPS).sum() * 1e-9

    one = jax.jit(one)

    def loop(k):
        acc = jnp.float32(0)
        for i in range(k):
            acc = acc + one(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
        return acc

    sec = diff_timed(loop, k=3)
    print(f"  pallas: {N_PATHS * N_STEPS / sec / 1e9:.2f}e9 path-steps/s")

    if "--lax" in sys.argv:
        s = base.corr_chol @ base.corr_chol.T
        args = tuple(jnp.asarray(x, jnp.float32) for x in (
            base.mu, base.omega, base.alpha, base.beta, s, params.q0,
            params.e0, base.sigma2_0, base.eps2_0))

        t0 = time.perf_counter()
        out = _dcc_simulate(jax.random.key(7), *args,
                            jnp.float32(0.05), jnp.float32(0.9),
                            n_paths=N_PATHS, n_steps=N_STEPS)
        float(out.sum())
        print(f"  lax first call (compile + run): {time.perf_counter() - t0:.1f} s")

        def lone(i):
            return _dcc_simulate(
                jax.random.fold_in(jax.random.key(0), i), *args,
                jnp.float32(0.05), jnp.float32(0.9),
                n_paths=N_PATHS, n_steps=N_STEPS).sum() * 1e-9

        lone = jax.jit(lone)

        def lloop(k):
            acc = jnp.float32(0)
            for i in range(k):
                acc = acc + lone(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
            return acc

        sec = diff_timed(lloop, k=2)
        print(f"  lax:    {N_PATHS * N_STEPS / sec / 1e9:.2f}e9 path-steps/s")


def unroll_ab():
    """DCC kernel unroll A/B (run after main's warm compile)."""
    import jax
    import jax.numpy as jnp

    from mcport.models.dcc import DCCGarchParams
    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops.pallas_dcc import pallas_dcc_terminal_returns
    from mcport.utils.profiling import diff_timed

    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    sig0 = np.full(N_ASSETS, 4e-4)
    base = CCCGarchParams(
        mu=rng.normal(1e-3, 5e-4, N_ASSETS), omega=sig0 * 0.1,
        alpha=np.full(N_ASSETS, 0.08), beta=np.full(N_ASSETS, 0.9),
        corr_chol=np.linalg.cholesky(corr), sigma2_0=sig0, eps2_0=sig0)
    params = DCCGarchParams(base=base, a_dcc=0.05, b_dcc=0.9,
                            q0=corr, e0=np.zeros(N_ASSETS))
    for u in (1, 2):
        @jax.jit
        def one(seed, u=u):
            return pallas_dcc_terminal_returns(
                seed, params, N_PATHS, N_STEPS, prefetch=False,
                unroll=u).sum() * 1e-9

        def loop(k, one=one):
            acc = jnp.float32(0)
            for i in range(k):
                acc = acc + one(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
            return acc

        sec = diff_timed(loop, k=3)
        print(f"  unroll={u}: {N_PATHS * N_STEPS / sec / 1e9:.2f}e9 path-steps/s")


def layout_ab():
    """Terminal-kernel layout A/B: tile (full / tri) vs pack (round 4).

    Long k=8 windows and max-of-3 interleaved rounds — the tunnel's
    between-window contention noise exceeds the tile-vs-tri delta otherwise.
    """
    import jax
    import jax.numpy as jnp

    from mcport.models.dcc import DCCGarchParams
    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops.pallas_dcc import pallas_dcc_terminal_returns
    from mcport.utils.profiling import diff_timed

    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    sig0 = np.full(N_ASSETS, 4e-4)
    base = CCCGarchParams(
        mu=rng.normal(1e-3, 5e-4, N_ASSETS), omega=sig0 * 0.1,
        alpha=np.full(N_ASSETS, 0.08), beta=np.full(N_ASSETS, 0.9),
        corr_chol=np.linalg.cholesky(corr), sigma2_0=sig0, eps2_0=sig0)
    params = DCCGarchParams(base=base, a_dcc=0.05, b_dcc=0.9,
                            q0=corr, e0=np.zeros(N_ASSETS))

    def make(kw):
        @jax.jit
        def one(seed):
            return pallas_dcc_terminal_returns(
                seed, params, N_PATHS, N_STEPS, **kw).sum() * 1e-9
        return one

    cfgs = {
        "tile full b=512 u=2": make(dict(layout="tile", tri=False, block=512,
                                         unroll=2)),
        "tile tri  b=512 u=2": make(dict(layout="tile", tri=True, block=512,
                                         unroll=2)),
        "pack      b=1024 u=4": make(dict(layout="pack", block=1024,
                                          unroll=4)),
    }

    def measure(one):
        def loop(k):
            acc = jnp.float32(0)
            for i in range(k):
                acc = acc + one(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
            return acc
        return N_PATHS * N_STEPS / diff_timed(loop, k=8) / 1e9

    hist = {n: [] for n in cfgs}
    for _ in range(3):
        for n, one in cfgs.items():
            hist[n].append(measure(one))
    for n, v in hist.items():
        runs = " ".join(f"{x:.2f}" for x in v)
        print(f"  {n}: max={max(v):.2f}e9 path-steps/s  (runs: {runs})")


if __name__ == "__main__":
    if "--unroll" in sys.argv:
        unroll_ab()
    elif "--layout" in sys.argv:
        layout_ab()
    else:
        main()
