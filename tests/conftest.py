"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding tests exercise real XLA collectives on a simulated
8-device CPU mesh (the JAX equivalent of multi-node-without-a-cluster; see
SURVEY.md section 4). This must run before any JAX backend initialization:
the container's sitecustomize registers an ``axon`` TPU platform whose first
use opens a slow tunnel — tests must never touch it.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by sitecustomize; the config path still wins as
# long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: repeat test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_suite_memory():
    """Drop JAX's in-memory executable caches after each test module.

    The full suite segfaulted on this 1-core host once resident memory
    crossed ~3 GB of accumulated compiled programs (observed 2026-08-19 in
    test_rigid3d under the CPU backend; the same test passes in isolation).
    The persistent on-disk cache (above) keeps the recompiles cheap."""
    yield
    jax.clear_caches()
