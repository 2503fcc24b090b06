"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so sharding paths are exercised
without TPU hardware (the standard JAX pattern for testing multi-chip code).
Must run before jax initializes a backend.
"""

import os

# Force the CPU backend with 8 virtual devices. This environment's
# sitecustomize registers a remote-TPU ("axon") backend at interpreter start
# and pins jax to it, so plain JAX_PLATFORMS env manipulation is too late —
# jax.config.update is the reliable override.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
