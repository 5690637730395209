"""ctypes wrapper for the native SGF / move-string codec
(native/sgf_codec.c) with pure-Python fallbacks.

The compact move-string codec (`coords2sgfstr` / `sgfstr2coords`,
/root/reference/src_cpp/elfgames/go/sgf/sgf.h:87/:97) runs on the training
server for every record received from the fleet, and the main-line parser
backs bulk offline SGF loading — the host-side hot paths the reference
keeps in C++ (sgf/sgf.cc).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import List, Optional, Tuple

import numpy as np

_lib = None
_lib_lock = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "sgf_codec.c")


def _build_lib() -> Optional[ctypes.CDLL]:
    from elf_tpu.native._build import load_lib

    lib = load_lib(_SRC, "libsgfcodec.so")
    if lib is None:
        return None
    lib.moves_to_sgfstr.restype = ctypes.c_int
    lib.moves_to_sgfstr.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.sgfstr_to_moves.restype = ctypes.c_int
    lib.sgfstr_to_moves.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    lib.parse_sgf_main.restype = ctypes.c_int
    lib.parse_sgf_main.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is None:
            _lib = _build_lib() or False
    return _lib or None


def moves_to_sgf_string(moves, size: int) -> str:
    """Compact move-list wire format "(;B[ab];W[cd];...)" (coords2sgfstr)."""
    lib = _get_lib()
    mv = np.asarray(list(moves), np.int32)
    if lib is not None:
        cap = 8 * len(mv) + 16
        buf = ctypes.create_string_buffer(cap)
        rc = lib.moves_to_sgfstr(size, np.ascontiguousarray(mv), len(mv), buf, cap)
        if rc >= 0:
            return buf.value.decode("ascii")
    from elf_tpu.env.go.coords import moves_to_sgf_string as py_impl

    return py_impl(mv, size)


def sgf_string_to_moves(s: str, size: int) -> List[int]:
    """Inverse of moves_to_sgf_string (sgfstr2coords)."""
    lib = _get_lib()
    if lib is not None:
        cap = max(len(s) // 4 + 4, 8)
        out = np.zeros(cap, np.int32)
        rc = lib.sgfstr_to_moves(s.encode("ascii", "replace"), size, out, cap)
        if rc >= 0:
            return [int(x) for x in out[:rc]]
    from elf_tpu.env.go.coords import sgf_string_to_moves as py_impl

    return py_impl(s, size)


def parse_sgf_main(
    text: str, max_moves: int = 2048
) -> Optional[Tuple[List[int], int, float, int, str]]:
    """Main-line parse of a full SGF: (moves, size, komi, handicap, result).

    Returns None when the native library is unavailable or the text is
    malformed — callers fall back to the Python parser (elf_tpu/sgf/sgf.py).
    """
    lib = _get_lib()
    if lib is None:
        return None
    out = np.zeros(max_moves, np.int32)
    size = ctypes.c_int(19)
    komi = ctypes.c_double(0.0)
    handicap = ctypes.c_int(0)
    result = ctypes.create_string_buffer(64)
    rc = lib.parse_sgf_main(
        text.encode("utf-8", "replace"), out, max_moves,
        ctypes.byref(size), ctypes.byref(komi), ctypes.byref(handicap),
        result, 64,
    )
    if rc < 0:
        return None
    return (
        [int(x) for x in out[:rc]],
        int(size.value),
        float(komi.value),
        int(handicap.value),
        result.value.decode("ascii", "replace"),
    )
