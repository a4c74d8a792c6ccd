"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per the framework's SPMD
design the same jitted code runs on 1 chip / N chips with only the mesh
shape changing, so tests exercise sharding on host CPU devices.

Note: the sandbox's sitecustomize imports jax at interpreter startup, so
platform selection must go through ``jax.config`` (env vars are read too
early to override here).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
