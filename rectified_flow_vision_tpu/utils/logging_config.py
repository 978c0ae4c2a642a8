"""Logging setup (parity with reference utils/logging_config.py:11-78).

stdlib logging, idempotent handler install, console + optional UTF-8 file
handler, ``"%(asctime)s | %(levelname)-8s | %(name)s | %(message)s"`` format.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional

_FORMAT = "%(asctime)s | %(levelname)-8s | %(name)s | %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"


def setup_logger(
    name: str = "flow_vision",
    level: int = logging.INFO,
    log_file: Optional[str] = None,
    format_string: Optional[str] = None,
) -> logging.Logger:
    """Configure and return a logger instance (idempotent)."""
    log = logging.getLogger(name)
    if log.handlers:
        return log

    log.setLevel(level)
    log.propagate = False  # own handlers only; avoids ancestor double-logging
    formatter = logging.Formatter(format_string or _FORMAT, datefmt=_DATEFMT)

    console = logging.StreamHandler(sys.stdout)
    console.setLevel(level)
    console.setFormatter(formatter)
    log.addHandler(console)

    if log_file is not None:
        log_path = Path(log_file)
        log_path.parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file, encoding="utf-8")
        fh.setLevel(level)
        fh.setFormatter(formatter)
        log.addHandler(fh)

    return log


def get_logger(name: str = "flow_vision") -> logging.Logger:
    """Get an existing logger or create one with defaults."""
    log = logging.getLogger(name)
    if not log.handlers:
        return setup_logger(name)
    return log


logger = setup_logger("flow_vision")
