"""Test configuration: force a virtual 8-device CPU platform.

SURVEY.md §4.4: JAX's fake-backend machinery lets the distributed paths
(pjit/psum data parallelism, sharded sliding-window eval) run in CI with no
TPU. Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The harness environment pins JAX_PLATFORMS=axon (the tunneled TPU) via a
# site hook that wins over our env var — override through the config API
# before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
