"""Test configuration: force a virtual 8-device CPU platform.

SURVEY.md §4.4: JAX's fake-backend machinery lets the distributed paths
(pjit/psum data parallelism, sharded sliding-window eval) run in CI with no
TPU. Must run before the first ``import jax`` anywhere in the test session.

TPU-marked tests (``pytest -m tpu``) need the real device instead; run them
as ``MEDSEG_TEST_TPU=1 python -m pytest tests/ -m tpu`` — the env var skips
the CPU override and keeps the default (TPU) backend.
"""

import os

ON_TPU = os.environ.get("MEDSEG_TEST_TPU", "0") == "1"

if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not ON_TPU:
    # The harness environment pins JAX_PLATFORMS=axon (the tunneled TPU) via a
    # site hook that wins over our env var — override through the config API
    # before any backend initializes.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: XLA:CPU compiles threefry RNG kernels at
# ~1.8s per (shape, distribution) — a tiny UNETR *init* alone costs ~50s of
# compile. The cache makes repeat `pytest -m "not slow"` runs (the
# contributor loop) pay that once per machine, not per run.
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg_tests")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

if not ON_TPU:
    assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"


def pytest_collection_modifyitems(config, items):
    """Skip tpu-marked tests unless MEDSEG_TEST_TPU=1; skip CPU-mesh-dependent
    tests when running against the real single-chip TPU."""
    skip_tpu = pytest.mark.skip(reason="needs MEDSEG_TEST_TPU=1 + real TPU")
    skip_cpu = pytest.mark.skip(reason="CPU-mesh test; run without MEDSEG_TEST_TPU")
    for item in items:
        has_tpu = "tpu" in item.keywords
        if has_tpu and not ON_TPU:
            item.add_marker(skip_tpu)
        if not has_tpu and ON_TPU:
            item.add_marker(skip_cpu)


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
