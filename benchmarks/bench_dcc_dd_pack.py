"""DCC candidate path-stats: tile+MXU vs packed-scalar+VPU scoring A/B.

The round-5 pack-relayout experiment (ROADMAP r4 candidate 3 / VERDICT r4
item 6): the pack layout won the TERMINAL kernel 2.2x, but the candidate
kernel needs a per-step score against W weight vectors — on the MXU that
means relaying A path slabs from sublanes to lanes every step. The
experiment kernel (ops/pallas_dcc._dcc_pack_dd_kernel) sidesteps the
relayout by scoring on the VPU in pack space (SMEM scalar weights, W x A
scalar-vector FMAs per step, per-candidate wealth/peak/dd slab carries,
w_block candidates per dispatch re-simulating the shared path stream).

Same-process A/B at the repo protocol (k=16 difference windows, best of 3):

    python benchmarks/bench_dcc_dd_pack.py

Prints tile (production default) then a pack (w_block, unroll) sweep, plus
the compile wall of each pack variant (the per-candidate unrolled score
chain is the compile-time risk). Verdict is recorded in RESULTS.md.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_ASSETS = 15
N_PATHS = 131_072
N_STEPS = 52
N_CAND = 256


def main():
    import jax
    import jax.numpy as jnp

    from mcport.models.dcc import DCCGarchParams
    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops.pallas_dcc import pallas_dcc_path_stats
    from mcport.utils.profiling import diff_timed, seed_chain

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
    cand = rng.dirichlet(np.ones(N_ASSETS), N_CAND).astype(np.float32)
    total = N_CAND * N_PATHS * N_STEPS

    chain = seed_chain

    def measure(label, **kw):
        @jax.jit
        def one(seed):
            t, d = pallas_dcc_path_stats(seed, params, cand, N_PATHS,
                                         N_STEPS, **kw)
            return (t.sum() + d.sum()) * 1e-9

        t0 = time.perf_counter()
        float(one(jnp.int32(0)))               # compile + 1 run
        wall = time.perf_counter() - t0
        rate = total / diff_timed(chain(one), k=16, trials=3)
        print(f"{label:44s} {rate/1e9:7.1f}e9 cand-path-steps/s "
              f"(first call incl. compile {wall:.1f}s)", flush=True)
        return rate

    # warm the transfer path
    float(jnp.zeros(()).sum())

    tile = measure("tile+MXU (production: tri, block=1024)")
    best = ("tile", tile)
    for w_block in (32, 64):
        for unroll in (1, 2):
            r = measure(f"pack+VPU w_block={w_block} unroll={unroll}",
                        layout="pack", w_block=w_block, unroll=unroll)
            if r > best[1]:
                best = (f"pack w_block={w_block} unroll={unroll}", r)
    print(f"\nwinner: {best[0]} at {best[1]/1e9:.1f}e9 "
          f"({best[1]/tile:.2f}x tile)")


if __name__ == "__main__":
    main()
