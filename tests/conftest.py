"""Test env: force CPU with 8 virtual devices so sharding logic is testable
without a pod (SURVEY §4 implication; JAX's xla_force_host_platform flag).

Note: this image preloads jax with a remote TPU ("axon") backend via
sitecustomize and overrides JAX_PLATFORMS, so env vars alone don't stick —
we must jax.config.update before the first backend use.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
