"""Test config: force JAX onto a virtual 8-device CPU mesh.

The environment registers a TPU ('axon') PJRT plugin for every interpreter
and pins JAX_PLATFORMS=axon, so the env-var route is not enough — we override
via jax.config before any backend is initialized.  XLA_FLAGS must be set
before first backend use to get the 8 virtual CPU devices used by the
sharding tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-bound on the 1-core CI
# box (fused-chunk equivalence tests each build multi-hundred-op programs);
# caching executables across runs cuts repeat wall-clock
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("VNERF_TEST_CACHE", "/root/.cache/jax_comp_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full: heavy redundant-coverage tests skipped in the default CI "
        "run (the suite is trace/compile-bound on the 1-core CI box); "
        "run them with VNERF_FULL_TESTS=1 (VERDICT r3 item 8 — the "
        "quality floors and the march/composite oracles stay in the "
        "default run)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("VNERF_FULL_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="marked 'full': run with VNERF_FULL_TESTS=1"
    )
    for item in items:
        if "full" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(21)
