"""Console/file logging.

Equivalent capability to the reference's ``utils/logging/logger.py:13,28`` and
``utils/logging/__init__.py:13,18`` (Logger/FileLogger + tagged log helpers).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional


class Logger:
    """Callable logger printing to stdout when verbose."""

    def __init__(self, verbose: bool = True):
        self.verbose = verbose

    def __call__(self, *args, **kwargs):
        if self.verbose:
            print(*args, **kwargs)
            sys.stdout.flush()


class FileLogger(Logger):
    """Logger that additionally appends every message to a file.

    Passing ``filepath=None`` disables file output (matching the reference's
    debug-mode behavior).
    """

    def __init__(self, filepath: Optional[str], verbose: bool = True):
        super().__init__(verbose=verbose)
        self.filepath = filepath
        if filepath is not None:
            directory = os.path.dirname(filepath)
            if directory:
                os.makedirs(directory, exist_ok=True)

    def __call__(self, *args, **kwargs):
        super().__call__(*args, **kwargs)
        if self.filepath is not None:
            with open(self.filepath, "a") as f:
                print(*args, file=f, **kwargs)


_global_logger = Logger(verbose=True)


def log(*args, **kwargs):
    _global_logger(*args, **kwargs)


def log_warn(*args, tag: str = "WARNING", **kwargs):
    _global_logger(f"[{tag}]", *args, **kwargs)


class LogOnTaskComplete:
    """Context manager logging start/end (+elapsed) of a named task."""

    def __init__(self, task_name: str, logger: Optional[Logger] = None):
        self.task_name = task_name
        self.logger = logger if logger is not None else _global_logger
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        self.logger(f"[{self.task_name}] started.")
        return self

    def __exit__(self, exc_type, exc, tb):
        dt = time.time() - self._t0
        status = "completed" if exc_type is None else f"FAILED ({exc_type.__name__})"
        self.logger(f"[{self.task_name}] {status} in {dt:.2f}s.")
        return False
