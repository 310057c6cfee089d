"""Process-wide singleton logger.

Capability parity with reference ``logger/main_logger.py:9-103``:
- singleton (one logger per process, re-init guarded),
- console handler + optional timestamped file handler under the run dir,
- ``sys.excepthook`` installed so uncaught exceptions land in the log,
- ``gpu_rank``-style filtering for multi-host runs — here implemented for
  real against ``jax.process_index()`` (the reference's version is a stub
  that always passes, main_logger.py:61-68).

jckx additions: a structured JSONL stream (``metrics.jsonl``) next to the
human log for scalars (losses, FID/IS, step time, images/sec), which the
reference only emitted as free text.
"""

from __future__ import annotations

import json
import logging
import os
import sys
from datetime import datetime
from typing import Any, Optional


class MainLogger:  # Singleton
    _instance = None
    _initialized = False

    def __new__(cls, *args, **kwargs):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __init__(self, config: Optional[Any] = None):
        if self._initialized:
            return

        self.logger_name = "main"
        self.logger = logging.getLogger(self.logger_name)
        self.logger.setLevel(logging.DEBUG)
        self.logger.propagate = False

        formatter = logging.Formatter("%(asctime)s %(levelname)s:%(message)s")
        handler = logging.StreamHandler()
        handler.setFormatter(formatter)
        self.logger.addHandler(handler)

        self._jsonl_path = None
        if config is not None and getattr(config, "log_file", 0) == 1:
            log_save_path = getattr(config, "save_path", "") or "."
            os.makedirs(log_save_path, exist_ok=True)
            datetime_now = datetime.now().strftime("%Y%m%d_%H%M%S")
            handler_file = logging.FileHandler(os.path.join(log_save_path, f"{datetime_now}.log"))
            handler_file.setLevel(logging.DEBUG)
            handler_file.setFormatter(formatter)
            self.logger.addHandler(handler_file)
            self._jsonl_path = os.path.join(log_save_path, "metrics.jsonl")

        self._initialized = True

        def catch_exception(exc_type, exc_value, exc_traceback):
            if issubclass(exc_type, KeyboardInterrupt):
                sys.__excepthook__(exc_type, exc_value, exc_traceback)
                return
            logging.getLogger("main").error(
                "Unexpected exception.", exc_info=(exc_type, exc_value, exc_traceback)
            )

        sys.excepthook = catch_exception

    # In a multi-host jax run only process 0 logs (unless rank explicitly
    # passed as >0 to force). Single-process: always logs.
    def _should_log(self, rank: int) -> bool:
        if rank >= 0:
            return rank == 0
        try:
            import jax

            return jax.process_index() == 0
        except Exception:
            return True

    def debug(self, msg: str, gpu_rank: int = -1):
        if self._should_log(gpu_rank):
            self.logger.debug(msg)

    def info(self, msg: str, gpu_rank: int = -1):
        if self._should_log(gpu_rank):
            self.logger.info(msg)

    def warning(self, msg: str, gpu_rank: int = -1):
        if self._should_log(gpu_rank):
            self.logger.warning(msg)

    def error(self, msg: str, gpu_rank: int = -1):
        if self._should_log(gpu_rank):
            self.logger.error(msg)

    def exception(self, msg: str, gpu_rank: int = -1):
        if self._should_log(gpu_rank):
            self.logger.exception(msg)

    def scalars(self, record: dict, gpu_rank: int = -1):
        """Structured scalar logging (jsonl). jckx extension."""
        if not self._should_log(gpu_rank) or self._jsonl_path is None:
            return
        with open(self._jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    @classmethod
    def reset(cls):
        """Drop the singleton (tests / multi-run processes)."""
        if cls._instance is not None:
            for h in list(cls._instance.logger.handlers):
                cls._instance.logger.removeHandler(h)
                h.close()
        cls._instance = None
        cls._initialized = False
