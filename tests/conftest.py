"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated without
real TPU hardware) with float64 enabled, for numerical parity against the reference
GPy/GPyOpt stack (float64 numpy/LAPACK throughout).

NOTE: the ambient environment pre-imports jax via a PYTHONPATH sitecustomize and pins
JAX_PLATFORMS=axon (a single-client TPU tunnel). Setting env vars here is too late —
jax is already imported — so the platform override must go through jax.config, and the
XLA host-device-count flag must be set before the CPU backend initializes (which it is,
as long as no array op ran yet).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(0)
