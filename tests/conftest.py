"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests exercise a multi-chip mesh without TPU hardware (the driver
separately dry-runs the multi-chip path; see __graft_entry__.py)."""

import os

# Force (not setdefault): the ambient environment may preset JAX_PLATFORMS
# to a real accelerator, but the suite needs the 8-device virtual CPU mesh
# and must not depend on remote hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The env var alone does not always win over ambient accelerator plugins;
# the config update does.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import gc

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute device-kernel compile tests; skipped unless "
        "NOVA_TEST_SLOW=1 (default suite wall-time budget, VERDICT r4 #8)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("NOVA_TEST_SLOW") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow device-kernel test; set NOVA_TEST_SLOW=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU compilation segfaults intermittently once the host process
    grows past ~10GB of live executables/traces; dropping in-process jit
    caches between modules keeps it small (compiled programs reload from
    the persistent cache)."""
    yield
    jax.clear_caches()
    gc.collect()
