"""Test configuration: force CPU with 8 virtual devices, enable x64.

Multi-chip sharding is validated on a virtual CPU mesh (the driver dry-runs
the real multi-chip path separately); fp64 is enabled so the parity tests can
compare against the golden oracle at full precision.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# jax is pre-imported at interpreter startup in this environment, so env vars
# are too late — use config updates (effective until backend initialization).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402
import numpy as np  # noqa: E402

from npswf_tpu.core.config import NPSConfig  # noqa: E402
from npswf_tpu.core.calibration import synthetic_calibration  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    return NPSConfig()


@pytest.fixture(scope="session")
def small_cfg():
    """A reduced-geometry config (6x5 grid) for fast exhaustive tests."""
    return NPSConfig(ncol=5, nlin=6)


@pytest.fixture(scope="session")
def cal(cfg):
    return synthetic_calibration(cfg, seed=1)


@pytest.fixture(scope="session")
def small_cal(small_cfg):
    return synthetic_calibration(small_cfg, seed=2)
