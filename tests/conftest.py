"""Test environment: hermetic CPU JAX with an 8-device virtual mesh.

This is the multi-chip testing strategy from SURVEY.md §4: the reference
never tests multi-node; we simulate an 8-chip slice on host CPU so every
sharding/collective path is exercised in CI without TPU hardware.

Mechanics note: the container's sitecustomize pre-imports jax and points
JAX_PLATFORMS at a remote TPU tunnel in every python process, so env vars
set here are too late — but the backend itself is only initialized on
first use, so `jax.config.update` still wins.  Running tests through the
TPU tunnel would be both slow (remote compiles) and non-hermetic.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(123)
