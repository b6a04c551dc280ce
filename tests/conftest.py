"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Must set the environment BEFORE jax is imported anywhere (SURVEY.md §4.5).
"""

import os

# NOTE: this machine pre-imports jax via sitecustomize with JAX_PLATFORMS=axon
# (one real TPU). Env vars alone are too late — force the CPU backend through
# jax.config. XLA_FLAGS still works because the CPU client initializes lazily.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Tight golden-parity tests against the float64 numpy oracle; production code
# paths stay float32 (data layer emits float32, params are float32).
jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
