"""Test configuration: all tests run on CPU with 8 virtual devices so the
multi-chip sharding path is exercised without TPU hardware
(XLA_FLAGS=--xla_force_host_platform_device_count, SURVEY.md §4)."""
import os

# Must be set before jax initializes a backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# PT_TPU_TESTS=1 keeps the real backend so the TPU-gated tests
# (tests/test_parity_full.py) can run on hardware:
#   PT_TPU_TESTS=1 python -m pytest tests/test_parity_full.py -m ""
if not os.environ.get("PT_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (deselect with -m 'not slow')")


@pytest.fixture(scope="session")
def cornell_path():
    """The Cornell scene from the repo's own self-contained fixtures."""
    from pathtracer_tpu.scene.fixtures import scene_path

    return scene_path("cornell")


@pytest.fixture(scope="session")
def cornell_small(cornell_path):
    from pathtracer_tpu import load_scene

    return load_scene(cornell_path, overrides={"RES": [64, 64], "DEPTH": 4,
                                               "ITERATIONS": 8})
