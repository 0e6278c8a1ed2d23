"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU bootstrap (sitecustomize) force-sets jax_platforms="axon,cpu"
# via jax.config at interpreter start; tests must run on the virtual 8-device
# CPU mesh, so override it back after import.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
