"""Test config: force CPU with 8 virtual devices before JAX initializes.

Multi-chip sharding paths are exercised on a fake 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the framework's
test strategy (no multi-chip TPU hardware in CI).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(1337)
