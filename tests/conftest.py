"""Test configuration: force a virtual 8-device CPU mesh.

Multi-device behavior (sharding, collectives) is tested on CPU via
XLA's host-platform device-count override — the JAX-native "fake backend"
the reference repo lacks (SURVEY.md §4).  Must run before jax imports.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin ignores the env var; force CPU through the config.
jax.config.update("jax_platforms", "cpu")
# Parity tests compare fp32 against torch: make f32 matmuls exact everywhere.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

REFERENCE = "/root/reference"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run full-SD-scale parity tests (slow tier)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow or RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session", autouse=True)
def _check_cpu_mesh():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8


@pytest.fixture(scope="session")
def reference_path():
    """Path to the PyTorch reference implementation (parity oracle).

    Reference modules are imported read-only as golden oracles; skip all
    parity tests when the reference tree isn't mounted.
    """
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not available")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return REFERENCE
