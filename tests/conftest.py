"""Test harness configuration.

Tests run on a virtual 8-device CPU backend so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).

The environment pins JAX_PLATFORMS=axon (one real TPU); plugins may import
jax before this conftest, so we override via jax.config (effective until
backend initialization) rather than os.environ alone.
"""

import os

# INTERNNAV_TPU_TESTS=1 keeps the real (axon TPU) backend so @pytest.mark.tpu
# tests can run on hardware; default is the virtual 8-device CPU backend.
_USE_TPU = os.environ.get("INTERNNAV_TPU_TESTS") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
# silence XLA's AOT-cache "machine feature" error spam on cache reload
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

if not _USE_TPU:
    assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def jax_devices():
    return jax.devices()
