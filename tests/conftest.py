"""Test configuration: force an 8-device virtual CPU mesh.

All tests run hermetically on CPU with 8 virtual XLA devices so sharding /
multi-chip code paths (mesh, pjit, shard_map, collectives) are exercised
without TPU hardware — mirroring the driver's ``dryrun_multichip`` check.
"""

import os

# Must be set before jax initializes its backends. Note: the hosted TPU
# plugin ignores JAX_PLATFORMS, so we set JAX_PLATFORM_NAME and also update
# jax.config below — both verified to force the CPU backend here.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
