"""Minimal registry logger — capability parity with
/root/reference/src/logging/logger.py (severity levels, stdout + file tee,
named registry, rank-0-only file policy handled by the caller)."""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Dict, Optional, TextIO

_LEVELS = {"debug": 10, "info": 20, "warning": 30, "error": 40, "critical": 50}
_REGISTRY: Dict[str, "Logger"] = {}


class Logger:
    def __init__(self, name: str, level: str = "info"):
        self.name = name
        self.level = _LEVELS[level]
        self._file: Optional[TextIO] = None

    def set_level(self, level: str):
        self.level = _LEVELS[level]

    def add_file(self, path: str | Path):
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        self._file = open(p, "a")

    def _emit(self, level: str, msg: str):
        if _LEVELS[level] < self.level:
            return
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        line = f"{stamp} {level.upper():8s} [{self.name}] {msg}"
        print(line, file=sys.stdout, flush=True)
        if self._file is not None:
            self._file.write(line + "\n")
            self._file.flush()

    def debug(self, msg: str):
        self._emit("debug", msg)

    def info(self, msg: str):
        self._emit("info", msg)

    def warning(self, msg: str):
        self._emit("warning", msg)

    def error(self, msg: str):
        self._emit("error", msg)


def getLogger(name: str = "SparseEventID") -> Logger:
    if name not in _REGISTRY:
        _REGISTRY[name] = Logger(name)
    return _REGISTRY[name]
