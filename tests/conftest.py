"""Test configuration: force JAX onto CPU with 8 virtual devices.

This is the idiomatic TPU substitute for multi-node testing without a
cluster (SURVEY.md §4): shardings/pjit compile and execute against 8 host
devices, so the same Mesh code paths run in CI and on real pods.
"""
import os

# jax may already be auto-imported at interpreter startup in this image, so
# plain env vars are not enough — set XLA_FLAGS (read lazily at backend init)
# AND override the platform through jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
