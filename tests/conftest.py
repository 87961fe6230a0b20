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


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run the slow tier (trainer/driver/gauntlet e2e tests)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: trainer/driver/gauntlet e2e tests excluded from the default "
        "fast tier (run with --runslow; CI runs both tiers)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(123)


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_between_modules():
    """Release compiled executables after each test module.

    A long single-process serial run (`pytest tests/ -x -q`) accumulates
    hundreds of XLA:CPU executables; past ~200 tests the NEXT backend
    compile segfaults inside LLVM (reproducibly at the same test, but
    only with the full-suite prefix — any half of the suite passes).
    Dropping the jit caches between modules keeps the live-executable
    population bounded and costs only intra-module cache reuse, which is
    minimal (shapes/configs differ per module anyway).
    """
    yield
    jax.clear_caches()
