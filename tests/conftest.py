"""Test configuration: force an 8-virtual-device CPU platform with x64.

Multi-host/multi-chip logic is tested without a cluster by running the
same shard_map code on 8 virtual CPU devices (SURVEY.md §4d); x64 gives
the 1e-10-grade oracles the baseline demands.

Note: on this machine the experimental 'axon' TPU plugin registers
itself regardless of JAX_PLATFORMS, so selecting CPU via env is not
enough — we additionally pin ``jax_default_device`` to a CPU device so
all test compute stays off the (single, lock-contended) TPU tunnel.
The XLA_FLAGS mutation must happen before jax initializes its backends,
hence at import time.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Drop the axon TPU plugin from the import path entirely: tests must never
# touch the (single, lock-contended) TPU tunnel, and the plugin ignores
# JAX_PLATFORMS=cpu if it is importable.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_enable_x64", True)

CPU_DEVICES = jax.devices("cpu")
jax.config.update("jax_default_device", CPU_DEVICES[0])

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def cpu_devices():
    return CPU_DEVICES
