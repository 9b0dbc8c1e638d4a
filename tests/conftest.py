"""Test harness: force JAX onto CPU with 8 virtual devices.

This is the TPU-native substitute for multi-node testing without a cluster
(SURVEY.md §4): sharding/collective code paths run on a virtual 8-device mesh.

NB: this environment pins JAX_PLATFORMS=axon (real TPU tunnel) via a site hook
that overrides the env var, so we must force the platform through jax.config
*before* backends initialize.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
