"""Shared build-on-first-use helper for the native C extensions.

Race-safe: each builder compiles into a unique tempfile (mkstemp) and
atomically os.replace()s it into place, so concurrent processes (pytest
workers, a client + a console) can never interleave writes into one
shared `.so.build` path; the cache directory is per-uid so multi-user
hosts don't collide on /tmp permissions.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional


def cache_dir() -> str:
    d = os.path.join(
        tempfile.gettempdir(), f"elf_tpu_native-{os.getuid()}"
    )
    os.makedirs(d, exist_ok=True)
    return d


def build_shared_lib(src: str, so_name: str) -> Optional[str]:
    """Compile `src` into <cache>/<so_name> if stale; returns the .so
    path or None if no compiler is available."""
    src = os.path.abspath(src)
    if not os.path.exists(src):
        return None
    so = os.path.join(cache_dir(), so_name)
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    fd, tmp = tempfile.mkstemp(suffix=".so.build", dir=cache_dir())
    os.close(fd)
    try:
        for cc in ("cc", "gcc", "clang"):
            try:
                subprocess.run(
                    [cc, "-O2", "-shared", "-fPIC", "-o", tmp, src],
                    check=True, capture_output=True, timeout=60,
                )
                os.replace(tmp, so)
                return so
            except (OSError, subprocess.SubprocessError):
                continue
        return None
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def load_lib(src: str, so_name: str) -> Optional[ctypes.CDLL]:
    so = build_shared_lib(src, so_name)
    return ctypes.CDLL(so) if so else None
