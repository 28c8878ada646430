"""Test configuration: CPU backend with 8 virtual devices, float64.

Mirrors the reference's test strategy (SURVEY.md section 4): multi-rank
behavior is exercised on one node — here via XLA's virtual host devices —
and numerics are validated in double precision.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS; put the tests back on CPU explicitly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from omega_tpu.mesh import planar_hex_mesh  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Bound host memory across the suite: compiled executables (and
    their baked-in mesh constants — interpret-mode Pallas kernels are
    large) otherwise accumulate to tens of GB over a full run and can
    OOM the host. Clearing per module trades some recompilation for a
    bounded footprint."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def mesh16():
    return planar_hex_mesh(16, 16, dc=1000.0)


@pytest.fixture(scope="session")
def mesh32():
    return planar_hex_mesh(32, 32, dc=500.0)
