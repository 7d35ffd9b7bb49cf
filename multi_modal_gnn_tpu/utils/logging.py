"""Logging setup (console + optional file), mirroring reference src/utils.py:170-211."""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional

_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s | %(message)s"
_DATEFMT = "%H:%M:%S"


def setup_logging(
    level: str = "INFO",
    log_file: Optional[str | Path] = None,
    force: bool = True,
) -> logging.Logger:
    """Configure root logging with a console handler and an optional file handler.

    Args:
        level: log level name ("DEBUG" | "INFO" | "WARNING" | "ERROR").
        log_file: if given, also append to this file (parents created).
        force: reconfigure handlers even if logging was already set up, so
            per-stage log files work when stages run in one process.
    """
    handlers: list[logging.Handler] = [logging.StreamHandler(sys.stderr)]
    if log_file is not None:
        path = Path(log_file)
        path.parent.mkdir(parents=True, exist_ok=True)
        handlers.append(logging.FileHandler(path))

    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format=_FORMAT,
        datefmt=_DATEFMT,
        handlers=handlers,
        force=force,
    )
    return logging.getLogger("multi_modal_gnn_tpu")


def get_logger(name: str = "multi_modal_gnn_tpu") -> logging.Logger:
    return logging.getLogger(name)
