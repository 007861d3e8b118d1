"""Test configuration: force CPU backend with 8 virtual devices.

Mirrors the reference's no-model CI stance (SURVEY §4: tests run without
real hardware/models); multi-chip sharding is validated on a virtual CPU
mesh per the build contract (__graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tiny_image(rng):
    """100×100 RGB fixture (the reference's RgbImage::new(100,100) analog)."""
    return rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
