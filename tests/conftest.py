"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; sharding tests run on the virtual
device mesh per the multi-host test strategy (SURVEY.md §4).

NOTE: this environment's sitecustomize imports jax and registers a TPU
plugin in every interpreter, so env vars (JAX_PLATFORMS / XLA_FLAGS) are
already baked by the time conftest runs. Use jax.config.update instead —
it takes effect as long as no backend has been initialized yet.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
