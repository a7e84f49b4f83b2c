"""QMC bridge path-risk variance study: scramble-to-scramble spread of the
drawdown quantities vs pseudo-random seed-to-seed spread at the SAME path
count (the path-tier counterpart of the terminal Sobol study; run on any
backend — sizes are small and the engines are lax here).

Protocol: R independent randomized-QMC replicates (per-replicate scramble
seed) vs R independent MC seeds; report the std of dd_p95 / dd_median /
port_mean across replicates. The oracle truth cancels — spread IS the
estimator error for unbiased/asymptotically-unbiased estimators.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu") if __name__ == "__main__" else None

import dataclasses

import numpy as np

from mcport.config import GBMConfig
from mcport.engine.path_risk import run_path_risk
from mcport.models.gbm import GBMParams


def main(n_paths=4096, n_steps=16, reps=12):
    a = 3
    params = GBMParams(
        s0=np.ones(a) * 100,
        mean_step=np.array([0.002, 0.001, 0.0015]),
        chol_step=np.linalg.cholesky(0.0009 * (0.6 * np.eye(a) + 0.4)),
    )
    w = np.array([0.5, 0.3, 0.2])
    rows = {}
    for label, qmc in (("mc", "none"), ("sobol", "sobol")):
        stats = []
        for r in range(reps):
            c = GBMConfig(n_paths=n_paths, path_block=n_paths, n_steps=n_steps,
                          seed=1000 * (r + 1), use_pallas=False, qmc=qmc)
            rep = run_path_risk(params, w, c)
            stats.append((rep.port_mean, rep.dd_median, rep.dd_p95, rep.var))
        arr = np.asarray(stats)
        rows[label] = arr.std(axis=0, ddof=1)
        print(f"{label:>6}: spread port_mean={rows[label][0]:.5f} "
              f"dd_median={rows[label][1]:.5f} dd_p95={rows[label][2]:.5f} "
              f"var={rows[label][3]:.5f}")
    ratio = rows["mc"] / np.maximum(rows["sobol"], 1e-12)
    print(f" ratio: port_mean={ratio[0]:.1f}x dd_median={ratio[1]:.1f}x "
          f"dd_p95={ratio[2]:.1f}x var={ratio[3]:.1f}x")
    return ratio


if __name__ == "__main__":
    main()
