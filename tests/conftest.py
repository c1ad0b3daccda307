"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware the standard way:
XLA host-platform device multiplexing. Must be set before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the env var; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is dominated by engine-step compiles;
# repeat runs start warm (cache entries are platform-keyed, safe to share).
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
