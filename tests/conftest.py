"""Test config: force CPU with 8 virtual devices.

The environment's axon sitecustomize claims the TPU and pins
JAX_PLATFORMS=axon at interpreter startup, so plain env vars in this file are
too late — but the backend itself initializes lazily, so overriding via
jax.config before the first computation still works. Multi-chip sharding
tests run on the resulting fake 8-device CPU mesh.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is compile-dominated on this 1-core
# host; cached programs cut a full run by several minutes. Keyed by HLO
# hash, so stale entries are never reused for changed programs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/zss_jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# build the native data-path library once if the toolchain is available
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
if not os.path.exists(os.path.join(_NATIVE_DIR, "libzss_loader.so")):
    import subprocess
    subprocess.run(["make", "-C", _NATIVE_DIR], capture_output=True)


@pytest.fixture
def rng():
    return np.random.RandomState(1337)
