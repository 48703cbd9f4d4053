"""Test harness config: force CPU with a virtual 8-device mesh.

Tests run on CPU so they are hermetic and can exercise multi-chip sharding
(jax.sharding.Mesh over 8 virtual devices) without TPU hardware. The real-chip
path is exercised by bench.py / __graft_entry__.py.

Note: this environment's sitecustomize prepends the experimental 'axon' TPU
platform to jax_platforms; an env var alone doesn't override it, so we also
update the jax config directly before any backend is initialised.
"""
import getpass
import os
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"

# Isolate the test compile cache from ~/.cache/jax_comp_cache: that dir can
# carry CPU executables AOT-compiled on a different machine type (the image
# bake host), whose unsupported instructions SIGILL/segfault when loaded
# ("Compile machine features ... vs host machine features" warning; observed
# as a flaky segfault in the r04 suite). A machine-local, PER-USER dir keeps
# caching across runs without loading a foreign-arch executable and without
# permission failures / cross-user poisoning on shared machines (r04
# advisor). test_multihost.py imports this constant for its subprocesses.
TEST_COMPILE_CACHE_DIR = os.path.join(
    tempfile.gettempdir(), f"jax_test_comp_cache_{getpass.getuser()}")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", TEST_COMPILE_CACHE_DIR)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop live compiled executables between test modules: the full suite
    accumulates every module's jitted programs in-process, and the
    late-alphabet modules (vocoder windows) have been observed to segfault
    flakily inside XLA:CPU only in that accumulated state (each passes in
    isolation). Module scope keeps intra-module caching intact."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
