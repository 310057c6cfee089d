"""Test harness: force JAX onto CPU with 8 virtual devices BEFORE jax import.

This is the reference's missing multi-device test story done the TPU-native
way (SURVEY.md §4): pjit sharding, collective semantics, and determinism are
all testable on a host-only machine with a faked 8-device mesh.
"""

import os

# NOTE: must OVERWRITE, not setdefault — the machine environment pins
# JAX_PLATFORMS=axon (the real-TPU tunnel), and tests must not run there.
# Installed pytest plugins (jaxtyping) import jax before this conftest, so
# the env var alone is not enough: also update jax config directly. Backends
# initialize lazily, so this is safe as long as no plugin touched devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "xla_force_host_platform_device_count=8 not applied"

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_logger_singleton():
    yield
    from jckx.logging.main_logger import MainLogger

    MainLogger.reset()
