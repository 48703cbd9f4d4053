"""Test harness config: force CPU with a virtual 8-device mesh.

Tests run on CPU so they are hermetic and can exercise multi-chip sharding
(jax.sharding.Mesh over 8 virtual devices) without TPU hardware. The real-chip
path is exercised by bench.py / __graft_entry__.py.

Note: this environment's sitecustomize prepends the experimental 'axon' TPU
platform to jax_platforms; an env var alone doesn't override it, so we also
update the jax config directly before any backend is initialised.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
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
    return np.random.default_rng(0)
