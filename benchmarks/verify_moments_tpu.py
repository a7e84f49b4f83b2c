"""TPU drive: 1e-6 moment parity at the 16.7M-path config-4 scale (VERDICT r1 item 1).

Protocol (tunnel-safe — only tiny arrays cross to host):

1. Run the resumable engine at config 4 (16.7M paths) on the fused Pallas kernel
   with the compensated f32 accumulators — ONE pass over the path space.
2. Re-run the SAME block streams one dispatch-group at a time, fetching each
   group's (A + A^2)-float moment contribution, and fold those contributions in
   float64 on host — the cross-block oracle. (Within-block accumulation error is
   pinned separately by tests/test_moment_scale.py's 16.7M CI test against an
   exact f64 oracle.)
3. Report the max relative deviation of mean/cov; the BASELINE.json:5 bar is 1e-6.

Also sanity-checks the adaptive log1p sketch: zero mass in the edge bins.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"


def main():
    import jax

    from mcport.config import DataConfig, GBMConfig
    from mcport.data import load_universe
    from mcport.engine.mc_engine import run_resumable_mc
    from mcport.models.gbm import estimate_gbm
    from mcport.ops.quantile import finalize_moments, MomentState
    import jax.numpy as jnp

    backend = jax.default_backend()
    daily = sorted(p for p in FIXTURES.glob("*.csv") if "7 Years Weekly" not in p.name)
    d = load_universe(paths=daily, config=DataConfig(period="D"))
    params = estimate_gbm(d.prices)
    a = d.n_assets
    w = np.full(a, 1.0 / a)

    n_paths = 16_777_216 if backend == "tpu" else 1_048_576
    cfg = GBMConfig(n_paths=n_paths, n_steps=52, path_block=262_144,
                    use_pallas=backend == "tpu")

    t0 = time.perf_counter()
    report, ck = run_resumable_mc(params, w, cfg)
    t1 = time.perf_counter()
    print(f"one-pass engine: {n_paths} paths in {t1-t0:.1f}s "
          f"({n_paths*cfg.n_steps/(t1-t0)/1e9:.2f}e9 path-steps/s incl. compile)")
    assert ck.done

    # cross-block oracle: same streams, one dispatch group at a time, f64 host fold
    shift64 = np.asarray(ck.shift, np.float64)
    o_count = 0.0
    o_sum = np.zeros(a, np.float64)
    o_outer = np.zeros((a, a), np.float64)
    group = 8
    ck2 = None
    t0 = time.perf_counter()
    prev = (0.0, o_sum.copy(), o_outer.copy())
    while True:
        _, ck2 = run_resumable_mc(params, w, cfg, checkpoint=ck2, max_blocks=group)
        # fetch this group's contribution = state delta (tiny: A + A^2 floats);
        # the engine state itself is compensated, so add back its low-order term
        cur = (float(ck2.count), ck2.sum.astype(np.float64) + ck2.sum_c.astype(np.float64),
               ck2.outer.astype(np.float64) + ck2.outer_c.astype(np.float64))
        o_count += cur[0] - prev[0]
        o_sum += cur[1] - prev[1]
        o_outer += cur[2] - prev[2]
        prev = cur
        if ck2.done:
            break
    t2 = time.perf_counter()
    print(f"oracle pass: {t2-t0:.1f}s in groups of {group} blocks")

    mean_c = o_sum / o_count
    o_cov = (o_outer - o_count * np.outer(mean_c, mean_c)) / (o_count - 1)
    o_mean = mean_c + shift64

    sd = np.sqrt(np.diag(o_cov))
    mean_err = np.max(np.abs(report.mean - o_mean) / np.maximum(np.abs(o_mean), sd))
    cov_err = np.max(np.abs(report.cov - o_cov) / np.outer(sd, sd))
    print(f"max rel mean deviation vs f64 cross-block oracle: {mean_err:.3e}")
    print(f"max rel cov  deviation vs f64 cross-block oracle: {cov_err:.3e}")
    ok = mean_err < 1e-6 and cov_err < 1e-6
    print("PASS (1e-6 bar)" if ok else "FAIL")

    hist = np.asarray(ck.hist)
    print(f"adaptive sketch [{ck.sketch_space}]: edge-bin mass = "
          f"{hist[0]:.0f}/{hist[-1]:.0f} of {hist.sum():.0f}")
    print(f"VaR95={report.var:.5f} CVaR95={report.cvar:.5f} mean={report.port_mean:.5f}")


if __name__ == "__main__":
    main()
