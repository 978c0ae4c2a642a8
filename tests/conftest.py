"""Test configuration: force the CPU backend with a fake 8-device mesh.

Must run before any jax backend initialisation. The axon TPU plugin in this
environment ignores JAX_PLATFORMS, so we use JAX_PLATFORM_NAME +
jax.config; XLA_FLAGS adds 8 virtual host devices so data/tensor-parallel
tests run without a real multi-chip slice (the standard JAX fake-cluster
trick the reference never had — its tests are CPU-tensor-only,
reference: tests/test_utils.py).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 fake CPU devices")
    return devices
