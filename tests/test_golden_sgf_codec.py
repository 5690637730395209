"""Wire-codec parity vs the reference's own coords2sgfstr/sgfstr2coords.

tests/golden/ref_sgf_codec_19.jsonl.gz was produced by
tools/golden_ref/gen_sgf_golden.cc calling the REFERENCE'S inline codec
(sgf/sgf.h:87,:97) on random move sequences.  The compact move string is
the wire format of game records (MsgResult "moves", record.h:184), so a
single divergent byte would break cross-implementation record exchange.
This test demands byte-identical encoding and inverse parsing from the
native (ctypes C) codec and its Python fallback.
"""

import gzip
import json
import os

import pytest

from elf_tpu.native import sgf_codec

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "ref_sgf_codec_19.jsonl.gz"
)


def _load():
    with gzip.open(GOLDEN, "rt") as f:
        return [json.loads(line) for line in f]


def test_encode_matches_reference():
    for g in _load():
        ours = sgf_codec.moves_to_sgf_string(g["moves"], 19)
        assert ours == g["sgf"], (
            f"wire string diverges: ours {ours[:80]!r} ref {g['sgf'][:80]!r}"
        )


def test_decode_matches_reference():
    for g in _load():
        back = sgf_codec.sgf_string_to_moves(g["sgf"], 19)
        assert back == g["moves"]


def test_python_fallback_matches_reference():
    """sgf_codec auto-selects the native library when available; the
    pure-Python fallback (env/go/coords.py) must match the reference
    bytes too — it is what hosts without a C toolchain ship."""
    from elf_tpu.env.go import coords

    for g in _load():
        assert coords.moves_to_sgf_string(g["moves"], 19) == g["sgf"]
        assert coords.sgf_string_to_moves(g["sgf"], 19) == g["moves"]

