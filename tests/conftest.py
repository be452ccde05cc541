"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, per the multi-chip validation strategy.

Note: the environment's sitecustomize registers an 'axon' TPU backend and
pins jax_platforms to it at interpreter start, so we must both set the
host-device-count XLA flag *and* re-override jax_platforms after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)
