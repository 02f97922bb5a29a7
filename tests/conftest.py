"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests work without a TPU pod and results are deterministic.
Set FSPT_TEST_TPU=1 to run the suite on real devices instead."""

import os

if not os.environ.get("FSPT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not os.environ.get("FSPT_TEST_TPU"):
    # the environment pre-sets JAX_PLATFORMS to the TPU plugin; the config
    # knob wins over the env var, so force CPU here too
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: integrator compiles dominate test wall-clock
jax.config.update("jax_compilation_cache_dir", "/tmp/fspt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def small_scene():
    from fspt_tpu.testing import make_test_scene
    return make_test_scene(subdivisions=2)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
