"""Test configuration: force CPU backend with 8 virtual devices.

Mirrors the reference's no-model CI stance (SURVEY §4: tests run without
real hardware/models); multi-chip sharding is validated on a virtual CPU
mesh per the build contract (__graft_entry__.dryrun_multichip).

Note: this environment's sitecustomize registers the axon TPU backend at
interpreter start and forces the platform, so plain env vars in conftest
are too late — we override via jax.config before any backend is touched.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tiny_image(rng):
    """100×100 RGB fixture (the reference's RgbImage::new(100,100) analog)."""
    return rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
