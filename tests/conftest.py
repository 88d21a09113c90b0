"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; sharding tests run on the virtual
device mesh per the multi-host test strategy (SURVEY.md §4).

NOTE: this environment's sitecustomize imports jax and registers a TPU
plugin in every interpreter, so env vars (JAX_PLATFORMS / XLA_FLAGS) are
already baked by the time conftest runs. Use jax.config.update instead —
it takes effect as long as no backend has been initialized yet.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent XLA compilation cache: the suite is dominated by jit
# compiles (83 tests ~7 min on a 2-core box); repeat runs hit the cache.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
