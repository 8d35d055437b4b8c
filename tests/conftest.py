"""Test config: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, hence here at
conftest import time (pytest imports conftest before any test module).
"""

import os

# the session env exports JAX_PLATFORMS=axon (the TPU tunnel) and the axon
# sitecustomize imports jax at interpreter start, freezing that choice as
# the config default — so the env var alone is not enough; jax.config.update
# below is the authoritative override. XLA_FLAGS is still read lazily at CPU
# backend init, so setting it here works.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    devices = np.array(jax.devices()[:8]).reshape(8)
    return jax.sharding.Mesh(devices, ("data",))


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
