"""Test configuration.

Runs the suite on CPU with 8 virtual XLA devices so multi-chip sharding
(mesh/pjit/shard_map) is exercised without TPU hardware, per the
standard JAX practice (SURVEY.md section 4).  Must set the environment
before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS (e.g. to a TPU plugin) via a
# site hook that wins over os.environ; the config route always works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(5)
