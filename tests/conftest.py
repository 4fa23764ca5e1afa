"""Test harness config: run every test on a virtual 8-device CPU mesh.

The standard JAX fake-backend trick (SURVEY.md §4e): sharding/collective
logic is exercised without TPU hardware, and tests stay hermetic and fast.
The harness pins ``JAX_PLATFORMS=axon`` in the environment, so the override
must go through ``jax.config`` before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("MUSICGAN_TEST_PLATFORM", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)

# The suite is compile-dominated (every WGAN-GP graph is a grad-of-grad
# compile); persist them so repeat runs drop from ~9 to ~3 minutes.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
