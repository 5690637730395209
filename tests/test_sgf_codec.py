"""Native SGF/move-string codec (native/sgf_codec.c): parity vs the
pure-Python implementations, plus the main-line parser against the Python
SGF parser on variation-bearing and escaped inputs."""

import numpy as np
import pytest

from elf_tpu.env.go import coords
from elf_tpu.native import sgf_codec
from elf_tpu.sgf import parse_sgf


def _native_available() -> bool:
    return sgf_codec._get_lib() is not None


pytestmark = pytest.mark.skipif(
    not _native_available(), reason="no C compiler for native codec"
)


@pytest.mark.parametrize("size", [9, 19])
def test_move_string_roundtrip(size):
    rng = np.random.default_rng(0)
    n2 = size * size
    moves = list(rng.integers(0, n2 + 1, size=100))
    s_native = sgf_codec.moves_to_sgf_string(moves, size)
    s_py = coords.moves_to_sgf_string(moves, size)
    assert s_native == s_py
    back_native = sgf_codec.sgf_string_to_moves(s_py, size)
    back_py = coords.sgf_string_to_moves(s_py, size)
    assert back_native == back_py == [int(m) for m in moves]


def test_move_string_empty():
    assert sgf_codec.moves_to_sgf_string([], 19) == "()"
    assert sgf_codec.sgf_string_to_moves("()", 19) == []


def test_legacy_tt_pass():
    assert sgf_codec.sgf_string_to_moves("(;B[tt])", 19) == [361]


def test_parse_main_line_matches_python():
    text = (
        "(;GM[1]FF[4]SZ[9]KM[5.5]RE[W+3.5]PB[x]PW[y]"
        ";B[dd];W[ee](;B[ff];W[gg])(;B[hh]))"
    )
    parsed = sgf_codec.parse_sgf_main(text)
    assert parsed is not None
    moves, size, komi, handicap, result = parsed
    game = parse_sgf(text)
    assert size == game.board_size == 9
    assert komi == game.komi == 5.5
    assert result == game.result == "W+3.5"
    assert moves == [m for _, m in game.main_moves()]
    # main line follows the FIRST variation
    assert len(moves) == 4


def test_parse_escaped_values_and_pass():
    text = "(;SZ[9]C[bracket \\] inside (parens)];B[];W[ab];B[tt])"
    parsed = sgf_codec.parse_sgf_main(text)
    assert parsed is not None
    moves, size, _, _, _ = parsed
    assert size == 9
    # B[] pass, W[ab] = row 1 col 0, B[tt] on 9x9 = pass
    assert moves == [81, 9, 81]


def test_parse_handicap_and_setup_ignored():
    text = "(;SZ[19]HA[2]AB[dd][pp];W[cc])"
    parsed = sgf_codec.parse_sgf_main(text)
    assert parsed is not None
    moves, size, _, handicap, _ = parsed
    assert handicap == 2
    assert moves == [2 * 19 + 2]


def test_sgf_variation_replay():
    """moves_along/variations: side-variation navigation (PARITY gap)."""
    text = "(;SZ[9];B[aa];W[bb](;B[cc];W[dd](;B[ee])(;B[ff]))(;B[gg]))"
    g = parse_sgf(text)
    assert [m for _, m in g.main_moves()] == [0, 10, 20, 30, 40]
    assert [m for _, m in g.moves_along((0, 1))] == [0, 10, 20, 30, 50]
    assert [m for _, m in g.moves_along((1,))] == [0, 10, 60]
    assert g.variations() == [(0, 0), (0, 1), (1,)]
