"""Test harness configuration.

Default (CPU) tier:
- Forces the CPU backend with 8 virtual devices so mesh/sharding/collective tests
  run without a TPU pod (SURVEY.md §4 "multi-chip without a pod").
- Enables x64 so golden-value parity tests can assert 1e-6+ agreement with the
  NumPy reference formulas (BASELINE.json "moments match ... to 1e-6").

TPU tier (VERDICT r1 item 9): ``MCPORT_TPU=1 pytest -m tpu`` keeps the real TPU
backend (no CPU forcing, no x64 — TPUs have no f64 hardware) and runs only the
``tpu``-marked tests, which exercise the COMPILED Pallas kernels: the hardware
PRNG + exponent-trick uniform path that interpret mode cannot reach. tpu-marked
tests auto-skip on any non-TPU backend, and non-tpu tests auto-skip in TPU mode
(x64 assumptions don't hold there).

Must set env vars before the first ``import jax`` anywhere in the test session.
"""

import os
import sys
from pathlib import Path

TPU_TIER = os.environ.get("MCPORT_TPU") == "1"

if not TPU_TIER:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # Suppress XLA's per-load E-log about the +prefer-no-scatter/gather
    # pseudo-features when reloading persistent-cache AOT results (benign:
    # those are compiler hints the host feature parser doesn't know, not
    # real ISA requirements; everything else in the feature lists matches).
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# repo root on sys.path so `import mcport` works without installation
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

if not TPU_TIER:
    # The axon TPU plugin ignores the JAX_PLATFORMS env var in this environment —
    # only the config update actually forces the CPU backend (verified
    # empirically); XLA_FLAGS above must still be set before import for the 8
    # virtual devices.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # Suite diet (VERDICT r3 item 6): persist compiled XLA:CPU executables
    # across workers and runs. The heavy interpret-mode kernel graphs compile
    # once, then every other xdist worker / subprocess test / future full run
    # AOT-loads them from disk (measured: cross-process reload of a 0.4 s
    # compile costs ~0). Repo-local dir, gitignored.
    _cache = Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.default_backend() == "tpu"
    skip_needs_tpu = pytest.mark.skip(
        reason="requires a real TPU backend (run via MCPORT_TPU=1 pytest -m tpu)"
    )
    skip_cpu_tier = pytest.mark.skip(
        reason="TPU tier runs only tpu-marked tests (x64/CPU assumptions absent)"
    )
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_needs_tpu)
        elif TPU_TIER and "tpu" not in item.keywords:
            item.add_marker(skip_cpu_tier)


@pytest.fixture(scope="session")
def fixtures_dir() -> Path:
    return FIXTURES


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
