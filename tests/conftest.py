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

# Persistent compile cache for the suite (S2AG_COMPILE_CACHE=0 disables,
# =path moves). Two effects on this 1-core compile-bound host:
# - WITHIN one run: tests that build fresh jit closures over identical
#   programs (every Trainer re-jits its train step; parity tests compile
#   N-of-the-same) hit the HLO-keyed cache instead of recompiling —
#   this speeds even a cold CI run;
# - ACROSS runs: reruns skip every unchanged program's compile.
# Deliberately NOT the repo-local warm dir (compile_cache.REPO_WARM_DIR):
# that ships TPU executables; CPU test entries would bloat the checkout.
from speech2affective_gestures_tpu import compile_cache  # noqa: E402

compile_cache.enable(
    os.environ.get("S2AG_COMPILE_CACHE", compile_cache.DEFAULT_DIR)
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    devices = np.array(jax.devices()[:8]).reshape(8)
    return jax.sharding.Mesh(devices, ("data",))


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
