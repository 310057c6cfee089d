"""Small cross-cutting helpers (reference ``utils.py``)."""

from jckx.utils.device import get_default_device, default_backend  # noqa: F401
