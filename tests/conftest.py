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
# compile); persist them so repeat runs drop from ~25 to ~5 minutes.
# Opt out with MUSICGAN_TEST_NO_COMPILE_CACHE=1.
if not os.environ.get("MUSICGAN_TEST_NO_COMPILE_CACHE"):
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


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Release compiled executables at each module boundary.

    Three full-suite runs segfaulted inside XLA:CPU compilation (LLVM)
    only after ~100+ accumulated compiles in one process — every
    affected test passes in isolation and whole modules pass alone
    (jax 0.9.0; 128 GB free, so not host OOM).  Dropping the pjit
    caches per module bounds the live-executable population; the
    persistent on-disk cache makes the re-compiles cheap.
    """
    yield
    jax.clear_caches()
