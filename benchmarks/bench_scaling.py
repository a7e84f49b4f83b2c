"""Mesh-scaling study: MC error and per-device work vs device count.

Runs the sharded GBM risk engine on 1/2/4/8-device meshes (CPU emulation by
default; a real pod uses the same code) holding *per-device* paths constant, and
records how the estimator spread shrinks as devices (and therefore total paths)
grow — the "variance shrinks linearly with pod size" claim of BASELINE.json:5.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python benchmarks/bench_scaling.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if len(jax.devices()) < 8:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mcport.config import DataConfig, SketchConfig
from mcport.data import load_universe
from mcport.models import estimate_gbm
from mcport.parallel import make_mesh, sharded_gbm_risk
from mcport.utils.logging import RunLogger

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"


def main() -> None:
    log = RunLogger(stream=sys.stdout)
    d = load_universe(
        paths=[FIXTURES / "BTC_USD 7 Years Weekly.csv", FIXTURES / "ETH_USD 7 Years Weekly.csv"],
        config=DataConfig(period="W"),
    )
    params = estimate_gbm(d.prices)
    w = np.array([0.5, 0.5], np.float32)
    per_device_paths = 4_096
    sketch = SketchConfig(n_bins=4096)

    devices = jax.devices()
    for n_dev in (1, 2, 4, 8):
        if len(devices) < n_dev:
            break
        mesh = make_mesh(devices[:n_dev])
        n_paths = per_device_paths * n_dev
        ests = []
        for s in range(40):
            out = sharded_gbm_risk(
                1000 * s, jnp.asarray(params.mean_step, jnp.float32),
                jnp.asarray(params.chol_step, jnp.float32), jnp.asarray(w),
                n_paths=n_paths, n_steps=16, mesh=mesh, sketch=sketch,
            )
            ests.append(float(out.port_mean))
        spread = float(np.std(ests))
        # spread * sqrt(paths) should be constant under ideal 1/sqrt(N) scaling
        log.log("scaling", n_devices=n_dev, total_paths=n_paths,
                est_spread=spread, spread_x_sqrt_paths=spread * np.sqrt(n_paths))


if __name__ == "__main__":
    main()
