"""Device selection (reference ``utils.py:4-8`` picks cuda-else-cpu).

In JAX the runtime picks the best backend automatically; these helpers exist
for API parity and for code that wants an explicit placement target.
"""

from __future__ import annotations

import jax


def get_default_device() -> jax.Device:
    """First device of the default backend (TPU if present, else CPU)."""
    return jax.devices()[0]


def default_backend() -> str:
    return jax.default_backend()


def honor_jax_platforms_env() -> None:
    """Re-assert JAX_PLATFORMS in-process.

    Some deployments force-register a TPU plugin from sitecustomize before
    env vars are consulted; backends resolve lazily, so pinning the config
    here (before any jax.devices() call) makes the env var effective —
    e.g. JAX_PLATFORMS=cpu with
    XLA_FLAGS=--xla_force_host_platform_device_count=8 runs any jckx CLI on
    a virtual 8-device mesh for sharding validation without chips."""
    import os

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
