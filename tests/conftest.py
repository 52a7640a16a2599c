"""Test harness config: run JAX on a virtual 8-device CPU platform.

This is the standard trick to exercise pjit / sharding logic without a
real TPU slice (SURVEY.md §4). Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session environment may pin JAX_PLATFORMS to a TPU platform before
# the env override above is visible to jax's config bootstrap — force it.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
