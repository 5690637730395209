"""ctypes wrapper for the native C game replayer (native/replayer.c).

Compiles the shared library on first use (cc -O2 -shared -fPIC) into a
cache dir; falls back to the pure-Python oracle engine if no compiler is
available.  See native/replayer.c for why this is native: record replay is
the host-side hot path of training-batch assembly (the counterpart of the
reference's C++ GoStateExtOffline replay, go_state_ext.h:259).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

from elf_tpu.native._build import load_lib

_lib = None
_lib_lock = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "replayer.c")


def _build_lib() -> Optional[ctypes.CDLL]:
    lib = load_lib(_SRC, "libreplayer.so")
    if lib is None:
        return None
    lib.replay_game.restype = ctypes.c_int
    lib.replay_game.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
    ]
    lib.replay_game_ex.restype = ctypes.c_int
    lib.replay_game_ex.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is None:
            _lib = _build_lib() or False
    return _lib or None


def replay_to_snapshots(moves, size: int, first_player: int = 1,
                        setup_black=(), setup_white=()) -> np.ndarray:
    """[n_moves, size*size] int8 boards after each move (pass = n2).

    `first_player` (1 black / 2 white) and setup stones support handicap
    and SGF-preloaded records, whose colors do NOT start black-on-even-ply
    from an empty board."""
    n2 = size * size
    mv = np.asarray(moves, np.int32)
    sb = np.ascontiguousarray(np.asarray(setup_black, np.int32))
    sw = np.ascontiguousarray(np.asarray(setup_white, np.int32))
    out = np.zeros((len(mv), n2), np.int8)
    lib = _get_lib()
    if lib is not None and len(mv) > 0:
        rc = lib.replay_game_ex(
            size, np.ascontiguousarray(mv), len(mv), int(first_player),
            sb, len(sb), sw, len(sw), out,
        )
        if rc == 0:
            return out
    # fallback: pure-Python oracle
    from elf_tpu.env.go.oracle import OracleGo

    o = OracleGo(size)
    for p in sb:
        o.stones[int(p)] = 1
    for p in sw:
        o.stones[int(p)] = 2
    o.to_play = int(first_player)
    for k, a in enumerate(mv):
        o.play(int(a))
        out[k] = np.asarray(o.stones, np.int8)
    return out
