"""Test harness configuration.

- Forces the CPU backend with 8 virtual devices so mesh/sharding/collective tests
  run without a TPU pod (SURVEY.md §4 "multi-chip without a pod").
- Enables x64 so golden-value parity tests can assert 1e-6+ agreement with the
  NumPy reference formulas (BASELINE.json "moments match ... to 1e-6").

Must set env vars before the first ``import jax`` anywhere in the test session.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# repo root on sys.path so `import mcport` works without installation
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this environment —
# only the config update actually forces the CPU backend (verified empirically);
# XLA_FLAGS above must still be set before import for the 8 virtual devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"


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
