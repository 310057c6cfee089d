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

_LOG_FORMAT = "%(asctime)s [%(levelname)s] %(message)s"


def _excepthook(exc_type, exc_value, exc_tb):
    """Route uncaught exceptions into the run log (reference capability:
    logger/main_logger.py installs an excepthook). Ctrl-C keeps the default
    traceback so interactive interrupts stay quiet in the log."""
    if issubclass(exc_type, KeyboardInterrupt):
        sys.__excepthook__(exc_type, exc_value, exc_tb)
    else:
        logging.getLogger("main").critical(
            "uncaught exception — aborting run",
            exc_info=(exc_type, exc_value, exc_tb),
        )


class MainLogger:  # Singleton
    _instance = None
    _initialized = False

    def __new__(cls, *args, **kwargs):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __init__(self, config: Optional[Any] = None):
        if self._initialized:
            # Late file attach: components constructed before the run dir
            # exists (e.g. the data preprocessor, a trainer ctor argument)
            # initialize the singleton with save_path="" — the trainer's own
            # MainLogger(cfg) call then lands here with the real run dir.
            self._maybe_attach_file(config)
            return

        self.logger_name = "main"
        self.logger = logging.getLogger(self.logger_name)
        self.logger.setLevel(logging.DEBUG)
        self.logger.propagate = False

        formatter = logging.Formatter(_LOG_FORMAT)
        console = logging.StreamHandler()
        console.setFormatter(formatter)
        self.logger.addHandler(console)

        self._jsonl_path = None
        self._file_attached = False
        self._maybe_attach_file(config)

        self._initialized = True
        sys.excepthook = _excepthook

    def _maybe_attach_file(self, config: Optional[Any]) -> None:
        """Attach the run-dir file handler + metrics.jsonl once a config with
        log_file=1 AND a concrete save_path shows up. With save_path empty the
        attach is deferred (not pointed at CWD) — the trainer sets the run dir
        and re-calls MainLogger(cfg), reference order main.py:64-74."""
        if (self._file_attached or config is None
                or getattr(config, "log_file", 0) != 1):
            return
        run_dir = getattr(config, "save_path", "")
        if not run_dir:
            return
        os.makedirs(run_dir, exist_ok=True)
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        to_file = logging.FileHandler(os.path.join(run_dir, f"{stamp}.log"))
        to_file.setFormatter(logging.Formatter(_LOG_FORMAT))
        self.logger.addHandler(to_file)
        self._jsonl_path = os.path.join(run_dir, "metrics.jsonl")
        self._file_attached = True

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
