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
import threading
from typing import Optional, Tuple

import numpy as np

from elf_tpu.native._build import load_lib

_lib = None
_lib_lock = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "ladder.c")


def _build_lib() -> Optional[ctypes.CDLL]:
    lib = load_lib(_SRC, "libladder.so")
    if lib is None:
        return None
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


def read_ladder(stones, move: int, player: int,
                size: Optional[int] = None, ko_point: int = -1,
                ko_color: int = 0) -> Tuple[str, int]:
    """Model-free classification of `move` by `player` plus its depth:
    ('capture', d) — starts a working ladder; ('doomed_escape', d) —
    flees into one; ('none', 0)."""
    d = ladder_capture_depth(stones, move, player, size, ko_point, ko_color)
    if d > 0:
        return "capture", d
    d = ladder_escape_depth(stones, move, player, size, ko_point, ko_color)
    if d > 0:
        return "doomed_escape", d
    return "none", 0


def classify_ladder_move(stones, move: int, player: int,
                         size: Optional[int] = None, ko_point: int = -1,
                         ko_color: int = 0) -> str:
    """Classification only; see read_ladder for (class, depth)."""
    return read_ladder(stones, move, player, size, ko_point, ko_color)[0]
