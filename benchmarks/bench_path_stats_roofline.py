"""Path-stats kernel roofline + attack (VERDICT r2 item 4).

Round 2 gave the TERMINAL kernel an isolation-kernel decomposition (found the
2x polynomial-normal win) but left path-stats at ~3.9-4.4e9 with no
equivalent analysis. This script:

1. decomposes the per-step chain with isolation kernels —
   rng+boxmuller only -> +split correlate -> +exp/value -> +peak/dd — so each
   component's share of step time is measured, not guessed;
2. attacks with the two candidates VERDICT named plus loop unrolling:
   - pair-correlate: both shocks of a Box-Muller pair in ONE
     (A_pad, 2*block) MXU matmul (operand L shared; halves per-step matmul
     dispatches at equal FLOPs);
   - fori_loop unroll=2/4 of the step pair loop (the terminal kernel's
     round-2 +5-8% lever, never applied here);
   - bf16 peak/dd carry (VERDICT candidate; expected small — (1, block)
     VPU ops).

All same-process difference-timed; variants share the production module's
normal-pair generator and correlate() so numbers are comparable with
gbm_path_stats itself.

    python benchmarks/bench_path_stats_roofline.py
"""

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_ASSETS = 15
N_PATHS = 1_048_576
N_STEPS = 252
BLOCK = 1024


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mcport.ops import pallas_gbm as pg
    from mcport.utils.profiling import diff_timed

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return

    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)
    mean = rng.normal(1e-3, 5e-4, N_ASSETS).astype(np.float32)
    w_np = rng.dirichlet(np.ones(N_ASSETS)).astype(np.float32)

    a_pad = 16

    def iso_kernel(seed_ref, m_ref, lt_ref, w_ref, out_ref, *, n_steps, mode,
                   unroll, dd_dtype, corr):
        block = out_ref.shape[1]
        pair = pg._make_normal_pair(False, seed_ref, (a_pad, block))
        m = m_ref[:]
        lt = lt_ref[:]
        w = w_ref[:]
        bkw = dict(precision="bfloat16", preferred_element_type=jnp.float32)
        if corr == "split":
            correlate = pg.correlate
        elif corr == "split2":
            # 2-term exact-L split: drops the l3 tail (~2^-18 relative on L)
            l1 = lt.astype(jnp.bfloat16)
            l2 = (lt - l1.astype(jnp.float32)).astype(jnp.bfloat16)

            def correlate(_lt, z):
                zb = z.astype(jnp.bfloat16)
                return jnp.dot(l1, zb, **bkw) + jnp.dot(l2, zb, **bkw)
        else:  # "bf16": the biased single pass (ceiling reference)
            lb = lt.astype(jnp.bfloat16)

            def correlate(_lt, z):
                return jnp.dot(lb, z.astype(jnp.bfloat16), **bkw)

        def chain(z, acc, lvl, peak, dd):
            if mode == "rng_only":
                return acc + z, lvl, peak, dd
            y = correlate(lt, z)
            x = m + y
            acc = acc + x
            if mode == "corr_only":
                return acc, lvl, peak, dd
            v = jnp.sum(w * jnp.exp(acc), axis=0, keepdims=True)
            if mode == "no_dd":
                return acc, v, peak, dd
            if dd_dtype == "bfloat16":
                vb = v.astype(jnp.bfloat16)
                peak = jnp.maximum(peak, vb)
                dd = jnp.minimum(dd, vb / peak - 1.0)
            else:
                peak = jnp.maximum(peak, v)
                dd = jnp.minimum(dd, v / peak - 1.0)
            return acc, v, peak, dd

        # Mosaic only supports unroll=1/full in lowered fori loops, so unroll
        # is MANUAL: one body iteration consumes `unroll` Box-Muller pairs
        # (2*unroll steps), preserving draw order.
        if mode == "paircorr":
            def body(i, carry):
                acc, lvl, peak, dd = carry
                for u in range(unroll):
                    z1, z2 = pair(i * unroll + u)
                    y = correlate(lt, jnp.concatenate([z1, z2], axis=1))
                    for half in (y[:, :block], y[:, block:]):
                        x = m + half
                        acc = acc + x
                        v = jnp.sum(w * jnp.exp(acc), axis=0, keepdims=True)
                        peak = jnp.maximum(peak, v)
                        dd = jnp.minimum(dd, v / peak - 1.0)
                return acc, v, peak, dd
        else:
            def body(i, carry):
                acc, lvl, peak, dd = carry
                for u in range(unroll):
                    z1, z2 = pair(i * unroll + u)
                    acc, lvl, peak, dd = chain(z1, acc, lvl, peak, dd)
                    acc, lvl, peak, dd = chain(z2, acc, lvl, peak, dd)
                return acc, lvl, peak, dd

        ddt = jnp.bfloat16 if dd_dtype == "bfloat16" else jnp.float32
        init = (jnp.zeros((a_pad, block), jnp.float32),
                jnp.ones((1, block), jnp.float32),
                jnp.ones((1, block), ddt),
                jnp.zeros((1, block), ddt))
        acc, lvl, peak, dd = jax.lax.fori_loop(0, n_steps // (2 * unroll),
                                               body, init)
        out_ref[0:1, :] = jnp.sum(acc, axis=0, keepdims=True)
        out_ref[1:2, :] = lvl.astype(jnp.float32)
        out_ref[2:3, :] = dd.astype(jnp.float32)
        out_ref[3:, :] = jnp.zeros((out_ref.shape[0] - 3, block), jnp.float32)

    @functools.partial(jax.jit,
                       static_argnames=("mode", "unroll", "dd_dtype", "corr"))
    def run(seed, mode="full", unroll=1, dd_dtype="float32", corr="split"):
        m_pad = jnp.zeros((a_pad, 1), jnp.float32).at[:N_ASSETS, 0].set(mean)
        lt_pad = jnp.zeros((a_pad, a_pad), jnp.float32).at[:N_ASSETS, :N_ASSETS].set(chol)
        w_pad = jnp.zeros((a_pad, 1), jnp.float32).at[:N_ASSETS, 0].set(w_np)
        grid = N_PATHS // BLOCK
        out = pl.pallas_call(
            functools.partial(iso_kernel, n_steps=N_STEPS, mode=mode,
                              unroll=unroll, dd_dtype=dd_dtype, corr=corr),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((a_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((a_pad, a_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((a_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, N_PATHS), jnp.float32),
        )(jnp.asarray(seed, jnp.int32).reshape(1), m_pad, lt_pad, w_pad)
        return out.sum() * 1e-9

    def measure(**kw):
        def loop(k):
            acc = jnp.float32(0)
            for i in range(k):
                acc = acc + run(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32), **kw)
            return acc
        return N_PATHS * N_STEPS / diff_timed(loop, k=4) / 1e9

    print("isolation decomposition (Gpath-steps/s):")
    rates = {}
    for mode in ("rng_only", "corr_only", "no_dd", "full"):
        rates[mode] = measure(mode=mode)
        print(f"  {mode:10s}: {rates[mode]:6.2f}e9")
    t = {m: 1.0 / r for m, r in rates.items()}
    tot = t["full"]
    print(f"  step-time shares: rng+bm {t['rng_only']/tot:.0%}, "
          f"correlate {(t['corr_only']-t['rng_only'])/tot:.0%}, "
          f"exp+value {(t['no_dd']-t['corr_only'])/tot:.0%}, "
          f"peak/dd {(tot-t['no_dd'])/tot:.0%}")

    print("attacks:")
    for label, kw in (("unroll=2", dict(mode="full", unroll=2)),
                      ("unroll=4", dict(mode="full", unroll=4)),
                      ("paircorr", dict(mode="paircorr")),
                      ("paircorr+unroll2", dict(mode="paircorr", unroll=2)),
                      ("split2 correlate", dict(mode="full", corr="split2")),
                      ("bf16 correlate (ceiling)", dict(mode="full", corr="bf16")),
                      ("split2+paircorr+u2",
                       dict(mode="paircorr", unroll=2, corr="split2")),
                      ("bf16 dd carry", dict(mode="full", dd_dtype="bfloat16"))):
        # (paircorr ignores dd_dtype — its body is f32-only)
        print(f"  {label:18s}: {measure(**kw):6.2f}e9")

    # production kernel for reference (same process)
    from mcport.ops.pallas_gbm import gbm_path_stats

    @jax.jit
    def prod(seed):
        term, port, dd = gbm_path_stats(seed, mean, chol, w_np, N_PATHS, N_STEPS)
        return (port.sum() + dd.sum()) * 1e-9

    def loop(k):
        acc = jnp.float32(0)
        for i in range(k):
            acc = acc + prod(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
        return acc

    print(f"  production gbm_path_stats: "
          f"{N_PATHS * N_STEPS / diff_timed(loop, k=4) / 1e9:6.2f}e9")


if __name__ == "__main__":
    main()
