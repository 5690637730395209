"""ctypes wrapper for the native ladder solver (native/ladder.c).

The counterpart of the reference's `checkLadder`/`checkLadderUseSearch`
(`/root/reference/src_cpp/elfgames/go/base/board.cc:300-521`,
`board.h:392`): host-side recursive capture/escape reading.

`ladder_escape_depth(stones, move, victim)`  — would the victim's escape
move run into a working ladder?  Returns capture depth (> 0) or 0.
`ladder_capture_depth(stones, move, capturer)` — does the capturer's
move start a working ladder on an adjacent group?
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_lib = None
_lib_lock = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "ladder.c")


def _build_lib() -> Optional[ctypes.CDLL]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    cache = os.path.join(tempfile.gettempdir(), "elf_tpu_native")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "libladder.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        tmp = so + ".build"
        for cc in ("cc", "gcc", "clang"):
            try:
                subprocess.run(
                    [cc, "-O2", "-shared", "-fPIC", "-o", tmp, src],
                    check=True, capture_output=True, timeout=60,
                )
                os.replace(tmp, so)
                break
            except (OSError, subprocess.SubprocessError):
                continue
        else:
            return None
    lib = ctypes.CDLL(so)
    for fn in ("ladder_escape_depth", "ladder_capture_depth"):
        f = getattr(lib, fn)
        f.restype = ctypes.c_int
        f.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
    return lib


def _get_lib() -> ctypes.CDLL:
    global _lib
    with _lib_lock:
        if _lib is None:
            _lib = _build_lib() or False
    if not _lib:
        raise RuntimeError(
            "native ladder solver unavailable (no C compiler found)"
        )
    return _lib


def _prep(stones) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(stones, np.int8).reshape(-1))


def ladder_escape_depth(stones, move: int, victim_color: int,
                        size: Optional[int] = None, ko_point: int = -1,
                        ko_color: int = 0) -> int:
    """checkLadder semantics: depth > 0 iff `victim_color` playing `move`
    (rescuing its atari'd group onto 2 liberties beside one strong enemy
    group) gets ladder-captured."""
    s = _prep(stones)
    size = size or int(np.sqrt(s.size))
    return int(_get_lib().ladder_escape_depth(
        size, s, int(ko_point), int(ko_color), int(move), int(victim_color)
    ))


def ladder_capture_depth(stones, move: int, capturer_color: int,
                         size: Optional[int] = None, ko_point: int = -1,
                         ko_color: int = 0) -> int:
    """depth > 0 iff `capturer_color` playing `move` ataris an adjacent
    group whose escape is ladder-doomed."""
    s = _prep(stones)
    size = size or int(np.sqrt(s.size))
    return int(_get_lib().ladder_capture_depth(
        size, s, int(ko_point), int(ko_color), int(move), int(capturer_color)
    ))


def classify_ladder_move(stones, move: int, player: int,
                         size: Optional[int] = None, ko_point: int = -1,
                         ko_color: int = 0) -> str:
    """Model-free classification of `move` by `player`:
    'capture' (starts a working ladder), 'doomed_escape' (flees into
    one), or 'none'."""
    if ladder_capture_depth(stones, move, player, size, ko_point,
                            ko_color) > 0:
        return "capture"
    if ladder_escape_depth(stones, move, player, size, ko_point,
                           ko_color) > 0:
        return "doomed_escape"
    return "none"
