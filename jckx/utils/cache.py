"""Persistent XLA compilation cache.

Every jit in this framework compiles through the remote TPU runtime
(seconds per program) or a 1-core CPU (minutes for the test suite). The
persistent cache makes each (program, flags) compile once per MACHINE
instead of once per process.

Enabled automatically on ``import jckx`` unless JCKX_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    if os.environ.get("JCKX_NO_COMPILE_CACHE") == "1":
        return
    import jax

    path = path or os.environ.get(
        "JCKX_COMPILE_CACHE_DIR", os.path.expanduser("~/.cache/jckx_xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass
