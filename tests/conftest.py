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

# Persistent compilation cache: DISABLED for the CPU suite as of round 4.
# The jaxlib in this environment segfaults inside CPU executable
# (de)serialization for one of the big fp32 pipeline executables
# (compilation_cache.put_executable_and_time -> executable.serialize(), and
# symmetrically on the read path) — deterministic, pre-existing on the
# round-3 tree, so it is an environment/jaxlib regression, not a test bug.
# Until the jaxlib is fixed, the suite pays cold compiles instead of
# crashing at test_fit::test_fp32_matches_fp64. bench.py keeps its own
# cache: the TPU AOT serialization path is unaffected (round-3 bench
# cached and re-read its executables fine).

import pytest  # noqa: E402
import numpy as np  # noqa: E402

from npswf_tpu.core.config import NPSConfig  # noqa: E402
from npswf_tpu.core.calibration import synthetic_calibration  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    A full single-process run accumulates ~100 XLA CPU executables (several
    GB RSS) and has been observed to segfault inside backend_compile near the
    end; clearing per module keeps the process lean. Recompiles are cheap via
    the persistent compilation cache above.
    """
    yield
    jax.clear_caches()


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
