"""Test harness: force JAX onto CPU with 8 virtual devices BEFORE jax import.

This is the reference's missing multi-device test story done the TPU-native
way (SURVEY.md §4): pjit sharding, collective semantics, and determinism are
all testable on a host-only machine with a faked 8-device mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_logger_singleton():
    yield
    from jckx.logging.main_logger import MainLogger

    MainLogger.reset()
