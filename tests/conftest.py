"""Test harness configuration.

Tests run on a virtual 8-device CPU backend so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def jax_devices():
    import jax

    return jax.devices()
