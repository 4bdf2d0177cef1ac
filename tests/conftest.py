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

# Persistent compile cache for the CPU test programs (separate from
# the committed TPU cache in .jax_cache/): the suite is
# compile-dominated on a cold machine (~14 min); warm reruns drop the
# XLA compiles.  Gitignored -- CPU binaries are machine-local.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(5)
