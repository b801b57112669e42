"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax import.

This is the stand-in for multi-chip testing without a pod slice (SURVEY.md §4):
sharding/collective tests run on a virtual 8-device CPU mesh.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
