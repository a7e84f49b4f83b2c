"""Headline benchmark: correlated-GBM throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json:2,8): 15 assets, 252 steps, Cholesky-correlated GBM paths,
fused Pallas terminal kernel on TPU (lax engine elsewhere). ``vs_baseline`` is
measured throughput over the driver-set target of 1e9 path-steps/sec/chip — the
reference publishes no numbers of its own (BASELINE.md).

All reductions stay on device; only one scalar leaves the chip (the axon tunnel
makes host transfers pathologically slow — see .claude/skills/verify/SKILL.md).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_PATH_STEPS_PER_SEC = 1e9  # BASELINE.json:5 target
N_ASSETS = 15
N_STEPS = 252
N_PATHS = 1_048_576
REPS = 5


def main() -> None:
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)
    mean = rng.normal(1e-3, 5e-4, N_ASSETS).astype(np.float32)
    n_paths = N_PATHS if on_tpu else 16_384  # CPU fallback stays honest but small

    if on_tpu:
        from mcport.ops.pallas_gbm import pallas_terminal_log_returns

        def one(seed):
            return pallas_terminal_log_returns(seed, mean, chol, n_paths, N_STEPS).sum()
    else:
        from mcport.models.gbm import terminal_log_returns

        def one(seed):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
            return terminal_log_returns(key, mean, chol, n_paths, N_STEPS).sum()

    # Timing protocol for the tunneled device (block_until_ready can return
    # before remote completion; host<->device traffic is erratic): run K and 2K
    # reps inside on-device fori_loops whose iterations are data-chained (the
    # next seed depends on the previous sum, so reps cannot overlap or be
    # elided), force completion with a scalar VALUE fetch (block_until_ready
    # alone is not trustworthy here), and take the difference — fetch/dispatch
    # overhead cancels, leaving K * per-rep time.
    def make_loop(k):
        @jax.jit
        def loop(seed0):
            def body(i, acc):
                chain = jnp.int32(acc * 1e-6) & 7  # data dependency, tiny seed jitter
                return acc + one(seed0 + (i + 1) * (1 << 20) + chain)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return loop

    float(jnp.zeros(()).sum())                 # warm the transfer path first
    loop_k, loop_2k = make_loop(REPS), make_loop(2 * REPS)
    float(loop_k(jnp.asarray(0, jnp.int32)))   # compile
    float(loop_2k(jnp.asarray(0, jnp.int32)))

    def timed(fn, seed):
        t0 = time.perf_counter()
        float(fn(jnp.asarray(seed, jnp.int32)))  # value fetch = true completion
        return time.perf_counter() - t0

    t_k = min(timed(loop_k, 11), timed(loop_k, 13))
    t_2k = min(timed(loop_2k, 17), timed(loop_2k, 19))
    dt = max(t_2k - t_k, 1e-9) / REPS
    value = n_paths * N_STEPS / dt

    print(
        json.dumps(
            {
                "metric": "gbm_path_steps_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "path-steps/s (15 assets, 252 steps, f32)",
                "vs_baseline": round(value / BASELINE_PATH_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
