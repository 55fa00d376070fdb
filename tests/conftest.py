"""Test configuration: run everything on a virtual 8-device CPU platform.

This is the TPU-native analogue of the reference's "gloo backend on one host" trick
(apps/train_hybrid_encoder.py:45-50, calc_metrics.py:33-40): multi-chip sharding code
is exercised on N virtual CPU jax devices so the suite runs anywhere. The driver
separately compile-checks the real multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

# The environment presets JAX_PLATFORMS=axon (the tunneled TPU) via sitecustomize,
# which clobbers the env var — force the platform through jax.config instead
# (must happen before the first backend use).
import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# Persistent compile cache makes repeated suite runs fast.
os.makedirs("/root/.cache/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture
def rng():
    return np.random.RandomState(0)
