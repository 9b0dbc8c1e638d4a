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


@pytest.fixture(autouse=True)
def _seed_torch_rng():
    """Pin torch's global RNG per test.

    Oracle tests construct live torch reference modules whose *random init*
    feeds golden/conversion comparisons; without this, weight draws (and e.g.
    spectral-norm power-iteration convergence) depend on which tests ran
    before — the round-2 order-dependent flake in test_gan.py.  Only seeds if
    torch is already imported so torch-free tests don't pay the import."""
    import sys

    torch = sys.modules.get("torch")
    if torch is not None:
        torch.manual_seed(0)
    yield
