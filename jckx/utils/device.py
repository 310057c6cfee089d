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
