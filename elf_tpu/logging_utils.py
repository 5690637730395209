"""Structured, index-suffixed logging.

Counterpart of the reference `IndexedLoggerFactory`
(`/root/reference/src_cpp/elf/logging/IndexedLoggerFactory.h:56`): every
subsystem instance gets a logger named `<base><index>` so parallel actors /
controllers are distinguishable, with one global level switch
(`--loglevel`, src_py/elf/logging/configuration.py:12).
"""

from __future__ import annotations

import itertools
import logging
import sys
import threading
from collections import defaultdict

_counters = defaultdict(itertools.count)
_lock = threading.Lock()
_configured = False


def configure(level: str = "info") -> None:
    global _configured
    with _lock:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(
            logging.Formatter(
                "[%(asctime)s.%(msecs)03d] [%(name)s] [%(levelname)s] %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        root = logging.getLogger("elf_tpu")
        root.handlers[:] = [h]
        root.setLevel(getattr(logging, level.upper(), logging.INFO))
        _configured = True


def get_indexed_logger(base: str) -> logging.Logger:
    """`getIndexedLogger`: append a per-base instance counter to the name."""
    if not _configured:
        configure()
    with _lock:
        idx = next(_counters[base])
    return logging.getLogger(f"elf_tpu.{base}{idx}")
