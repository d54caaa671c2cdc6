"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding paths are exercised on a virtual CPU mesh
(``xla_force_host_platform_device_count=8``) exactly as SURVEY.md §4
prescribes — no TPU pod needed in CI.

Note: this environment's axon sitecustomize force-sets
``jax_platforms="axon,cpu"`` (routing everything to a tunneled TPU chip
with very high dispatch latency), so the ``JAX_PLATFORMS`` env var alone is
not enough — we must override via ``jax.config`` before any backend
initializes.
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

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_nerf():
    """Import the reference package as a torch-CPU oracle (not copied)."""
    import sys

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import nerf.model as ref_model

    return ref_model


@pytest.fixture
def rng():
    return np.random.default_rng(0)
