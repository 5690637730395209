"""Reference-authored golden tests, ported case-for-case from the
reference's hand-written 9x9 tables (themselves "loosely ported from the
MiniGo project's excellent unit tests"):

  /root/reference/src_cpp/elfgames/go/base/test/go_test.cc
  /root/reference/src_cpp/elfgames/go/base/test/board_feature_test.cc
  /root/reference/src_cpp/elfgames/go/base/test/symmetry_test.cc

Unlike the oracle-fuzz tests (tests/test_engine.py), the positions AND the
expected outcomes here come from reference-authored tables, so they are
independent of this repo's own Go implementation.

Conventions carried over from the reference's test_utils.h:
 - board strings are 81 chars, index i -> x = i % 9 (column), y = i / 9
   (row); our flat index = y * size + x = i, so the string maps directly;
 - `loadBoard` PLAYS the stones through the engine (interleaving passes to
   give the right color the turn), so group/ko bookkeeping is real;
 - sgf-style coords: "ea" -> x='e'-'a'=4, y='a'-'a'=0 -> flat 4.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from elf_tpu.env.go import engine
from elf_tpu.env.go.engine import BLACK, WHITE, init_core, step_core

SIZE = 9
N2 = SIZE * SIZE
PASS = N2


def s2c(s: str, size: int = SIZE) -> int:
    """sgf.h:22 str2coord ("aa" -> 0, "ia" -> 8, "ai" -> 72)."""
    if not s:
        return size * size
    x = ord(s[0]) - ord("a")
    y = ord(s[1]) - ord("a")
    return y * size + x


def rows(*parts: str) -> str:
    s = "".join(parts)
    assert len(s) == N2
    return s


def flip_colors(s: str) -> str:
    return s.translate(str.maketrans("XO", "OX"))


def load_board(s: str, to_play: int = BLACK):
    """test_utils.h loadBoard: play every stone through the engine,
    passing when the stone's color is not on turn; then give the turn."""
    core = init_core(1, SIZE)
    for i, ch in enumerate(s):
        if ch == ".":
            continue
        color = BLACK if ch == "X" else WHITE
        if int(core.to_play[0]) != color:
            core, _ = step_core(core, np.array([PASS]), SIZE)
        core, info = step_core(core, np.array([i]), SIZE)
        assert not bool(info.illegal[0]), f"stone {i} illegal during load"
    if int(core.to_play[0]) != to_play:
        core, _ = step_core(core, np.array([PASS]), SIZE)
    return core


def stones_of(core) -> np.ndarray:
    return np.asarray(core.stones)[0]


def board_from_string(s: str) -> np.ndarray:
    out = np.zeros(N2, np.int8)
    for i, ch in enumerate(s):
        if ch == "X":
            out[i] = BLACK
        elif ch == "O":
            out[i] = WHITE
    return out


def legal_mask(core) -> np.ndarray:
    return np.asarray(engine.legal_moves(core, SIZE))[0]


class TestGoTest:
    """go_test.cc ports (behavioral cases; group-id internals N/A to the
    gather-free array engine)."""

    def test_load_board_empty(self):
        core = load_board("." * N2)
        assert (stones_of(core) == 0).all()

    def test_is_move_suicidal(self):
        # go_test.cc:439 testIsMoveSuicidal
        s = rows(
            "...O.O...",
            "....O....",
            "XO.....O.",
            "OXO...OXO",
            "O.XO.OX.O",
            "OXO...OOX",
            "XO.......",
            "......XXO",
            ".....XOO.",
        )
        core = load_board(s, to_play=BLACK)
        lm = legal_mask(core)
        for mv in ("ea", "he"):          # suicidal for black
            assert not lm[s2c(mv)], mv
            _, info = step_core(core, np.array([s2c(mv)]), SIZE)
            assert bool(info.illegal[0]), mv
        for mv in ("be", "ii", "aa"):    # not suicidal
            assert lm[s2c(mv)], mv
            _, info = step_core(core, np.array([s2c(mv)]), SIZE)
            assert not bool(info.illegal[0]), mv

    def test_legal_moves_table(self):
        # go_test.cc:469 testLegalMoves (+ color-flipped board)
        s = rows(
            ".O.O.XOX.",
            "O..OOOOOX",
            "......O.O",
            "OO.....OX",
            "XO.....X.",
            ".O.......",
            "OX.....OO",
            "XX...OOOX",
            ".....O.X.",
        )
        for board, player in ((s, BLACK), (flip_colors(s), WHITE)):
            core = load_board(board, to_play=player)
            lm = legal_mask(core)
            for mv in ("aa", "ea", "ia"):
                assert not lm[s2c(mv)], mv
            for mv in ("af", "gi", "ii", "hc"):
                assert lm[s2c(mv)], mv
            # every mask-legal move must actually step legally
            for a in np.nonzero(lm[:N2])[0]:
                _, info = step_core(core, np.array([int(a)]), SIZE)
                assert not bool(info.illegal[0]), int(a)

    def test_move_with_captures(self):
        # go_test.cc:533 testMoveWithCaptures: bh captures two white groups
        s = rows(
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            "XXXX.....",
            "XOOX.....",
            "O.OX.....",
            "OOXX.....",
        )
        core = load_board(s, to_play=BLACK)
        core, info = step_core(core, np.array([s2c("bh")]), SIZE)
        assert not bool(info.illegal[0])
        expect = rows(
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            "XXXX.....",
            "X..X.....",
            ".X.X.....",
            "..XX.....",
        )
        np.testing.assert_array_equal(stones_of(core),
                                      board_from_string(expect))

    def test_capture_multiple_groups(self):
        # go_test.cc:215 testCaptureMultipleGroups: black aa captures 2
        s = rows(
            ".OX......",
            "OXX......",
            "XX.......",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
        )
        core = load_board(s, to_play=BLACK)
        core, info = step_core(core, np.array([s2c("aa")]), SIZE)
        assert int(info.captured[0]) == 2
        st = stones_of(core)
        assert st[s2c("aa")] == BLACK
        assert st[s2c("ba")] == 0 and st[s2c("ab")] == 0  # whites gone

    def test_capture_stone_and_many(self):
        # go_test.cc:255 testCaptureStone / :286 testCaptureMany
        s = rows(
            ".X.......",
            "XO.......",
            ".X.......",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
        )
        core = load_board(s, to_play=BLACK)
        core, info = step_core(core, np.array([s2c("ca")]), SIZE)
        # ca = (x=2,y=0)? reference plays toFlat(2,1) = x=2,y=1 -> "cb"
        # correct move is (2, 1):
        core2 = load_board(s, to_play=BLACK)
        core2, info2 = step_core(core2, np.array([1 * SIZE + 2]), SIZE)
        assert int(info2.captured[0]) == 1
        assert stones_of(core2)[1 * SIZE + 1] == 0

        s = rows(
            ".XX......",
            "XOO......",
            ".XX......",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
        )
        core = load_board(s, to_play=BLACK)
        core, info = step_core(core, np.array([1 * SIZE + 3]), SIZE)
        assert int(info.captured[0]) == 2
        st = stones_of(core)
        assert st[1 * SIZE + 1] == 0 and st[1 * SIZE + 2] == 0

    def test_ko_move(self):
        # go_test.cc:565 testKoMove
        s = rows(
            ".OX......",
            "OX.......",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
        )
        core = load_board(s, to_play=BLACK)
        core, info = step_core(core, np.array([s2c("aa")]), SIZE)
        assert not bool(info.illegal[0])
        expect = rows(
            "X.X......",
            "OX.......",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
        )
        np.testing.assert_array_equal(stones_of(core),
                                      board_from_string(expect))
        # immediate white retake at ba is the ko ban
        _, info = step_core(core, np.array([s2c("ba")]), SIZE)
        assert bool(info.illegal[0])
        assert not legal_mask(core)[s2c("ba")]
        # after two other moves the retake is legal
        core, _ = step_core(core, np.array([s2c("ii")]), SIZE)
        core, _ = step_core(core, np.array([s2c("ih")]), SIZE)
        core, info = step_core(core, np.array([s2c("ba")]), SIZE)
        assert not bool(info.illegal[0])

    def test_pass_and_game_over(self):
        # go_test.cc:407 testPosition (pass leaves board) + :604 gameover
        s = rows(
            ".X.....OO",
            "X........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
        )
        core = load_board(s)
        before = stones_of(core).copy()
        core2, _ = step_core(core, np.array([PASS]), SIZE)
        np.testing.assert_array_equal(stones_of(core2), before)

        core = init_core(1, SIZE)
        assert not bool(engine.is_terminal_core(core, SIZE)[0])
        core, _ = step_core(core, np.array([PASS]), SIZE)
        assert not bool(engine.is_terminal_core(core, SIZE)[0])
        core, _ = step_core(core, np.array([PASS]), SIZE)
        assert bool(engine.is_terminal_core(core, SIZE)[0])

    def test_position_moves(self):
        # go_test.cc:407 testPosition second half: black ca, white ib
        s = rows(
            ".X.....OO",
            "X........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
        )
        core = load_board(s, to_play=BLACK)
        core, _ = step_core(core, np.array([s2c("ca")]), SIZE)
        core, _ = step_core(core, np.array([s2c("ib")]), SIZE)
        expect = rows(
            ".XX....OO",
            "X.......O",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
        )
        np.testing.assert_array_equal(stones_of(core),
                                      board_from_string(expect))

    def test_scoring(self):
        # go_test.cc:611 testScoring: TT score - 6.5 komi
        s = rows(
            ".XX......",
            "OOXX.....",
            "OOOX...X.",
            "OXX......",
            "OOXXXXXX.",
            "OOOXOXOXX",
            ".O.OOXOOX",
            ".O.O.OOXX",
            "......OOO",
        )
        core = load_board(s)
        tt = float(np.asarray(engine.score_tromp_taylor(core, SIZE))[0])
        assert tt - 6.5 == pytest.approx(1.5)
        core2 = load_board("X" + s[1:])
        tt2 = float(np.asarray(engine.score_tromp_taylor(core2, SIZE))[0])
        assert tt2 - 6.5 == pytest.approx(2.5)

    def test_replay_position(self):
        # go_test.cc:634 testReplayPosition: a 60-move game (with one
        # illegal repeat the engine must reject silently) reaches the
        # reference's final diagram
        s = (
            "B[fd];W[cf];B[eg];W[dd];B[dc];W[cc];B[de];W[cd];"
            "B[ed];W[he];B[ce];W[be];B[df];W[bf];B[hd];W[ge];"
            "B[gd];W[gg];B[db];W[cb];B[cg];W[bg];B[gh];W[fh];"
            "B[hh];W[fg];B[eh];W[ei];B[di];W[fi];B[hg];W[dh];"
            "B[ch];W[ci];B[bh];W[ff];B[fe];W[hf];B[id];W[bi];"
            "B[ah];W[ef];B[dg];W[ee];B[di];W[ig];B[ai];W[ih];"
            "B[fb];W[hi];B[ag];W[ab];B[bd];W[bc];B[ae];W[ad];"
            "B[af];W[bd];B[ca];W[ba];B[da];W[ie]"
        )
        core = init_core(1, SIZE)
        for part in s.split(";"):
            mv = part[2:4]
            core, info = step_core(core, np.array([s2c(mv)]), SIZE)
            # ILLEGAL repeats leave the board unchanged AND do not flip the
            # turn in the reference (forward returns false); our step_core
            # keeps the state identical on illegal rows too
        expect = rows(
            ".OXX.....",
            "O.OX.X...",
            ".OOX.....",
            "OOOOXXXXX",
            "XOXXOXOOO",
            "XOOXOO.O.",
            "XOXXXOOXO",
            "XXX.XOXXO",
            "X..XOO.O.",
        )
        np.testing.assert_array_equal(stones_of(core),
                                      board_from_string(expect))


class TestEyeish:
    """go_test.cc:42 testEyeish, on the vectorized tactics module."""

    def test_eyeish_table(self):
        from elf_tpu.env.go.tactics import eye_mask

        s = rows(
            ".XX...XXX",
            "X.X...X.X",
            "XX.....X.",
            "........X",
            "XXXX.....",
            "OOOX....O",
            "X.OXX.OO.",
            ".XO.X.O.O",
            "XXO.X.OO.",
        )
        stones = board_from_string(s)[None]
        b_eyes = np.asarray(eye_mask(jnp.asarray(stones),
                                     jnp.int8(BLACK), SIZE))[0]
        w_eyes = np.asarray(eye_mask(jnp.asarray(stones),
                                     jnp.int8(WHITE), SIZE))[0]
        for mv in ("aa", "bb", "ah", "hb", "ic"):
            assert b_eyes[s2c(mv)], mv
        for mv in ("ii", "hh", "ig"):
            assert w_eyes[s2c(mv)], mv
        for mv in ("bg", "ee"):
            assert not b_eyes[s2c(mv)], mv
            assert not w_eyes[s2c(mv)], mv

    def test_fake_and_true_eyes(self):
        """A corner eye with an opponent diagonal is fake
        (board.cc:1887: edge eyes tolerate zero opponent diagonals)."""
        from elf_tpu.env.go.tactics import fake_eye_mask, true_eye_mask

        s = rows(
            ".X.......",
            "XX.......",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
        )
        stones = board_from_string(s)[None]
        t = np.asarray(true_eye_mask(jnp.asarray(stones),
                                     jnp.int8(BLACK), SIZE))[0]
        assert t[s2c("aa")]
        # the diagonal rule on an edge eye: ea with one opponent diagonal
        # (db = (3,1) is diagonal to ea = (4,0); the edge supplies the
        # two off-board diagonals)
        s2_ = rows(
            "...X.X...",
            "...OXX...",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
        )
        stones2 = board_from_string(s2_)[None]
        f = np.asarray(fake_eye_mask(jnp.asarray(stones2),
                                     jnp.int8(BLACK), SIZE))[0]
        assert f[s2c("ea")]  # edge eye with one opponent diagonal = fake

    def test_self_atari(self):
        """Playing into a two-point corner enclosure is self-atari; an
        open-area move is not; a zero-liberty point is illegal, not
        self-atari (isSelfAtari, board.cc:254)."""
        from elf_tpu.env.go.tactics import self_atari_mask

        # black walls off the aa/ba corner pair
        s = rows(
            "..X......",
            "XXX......",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
        )
        core = load_board(s, to_play=WHITE)
        sa = np.asarray(self_atari_mask(core, SIZE))[0]
        # white aa: chain {aa} has the single liberty ba -> self-atari
        assert sa[s2c("aa")]
        # white ba: chain {ba} has the single liberty aa -> self-atari
        assert sa[s2c("ba")]
        # open-area moves are safe
        assert not sa[s2c("ee")]
        assert not sa[s2c("ai")]

        # a zero-liberty placement is illegal, never self-atari
        s0 = rows(
            ".X.......",
            "X........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
            ".........",
        )
        core0 = load_board(s0, to_play=WHITE)
        sa0 = np.asarray(self_atari_mask(core0, SIZE))[0]
        assert not sa0[s2c("aa")]


class TestFeatureGolden:
    """board_feature_test.cc:24 testAgzFeature — channel-exact AGZ planes
    after B(0,0) W(0,1) B(0,2) W(0,3) B(1,1) (which captures W(0,1)).
    (x, y) below use the reference's coords; our plane index is [y, x]."""

    def test_agz_channels(self):
        from elf_tpu.env.go import state as gostate
        from elf_tpu.env.go.features import extract_agz

        st = gostate.init_state(1, SIZE)
        for (x, y) in ((0, 0), (0, 1), (0, 2), (0, 3), (1, 1)):
            st, _ = gostate.step(st, np.array([y * SIZE + x]), SIZE)
        feats = np.asarray(
            extract_agz(st, jnp.zeros((1,), jnp.int32), SIZE)
        )[0]  # [9, 9, 18]
        assert feats.shape == (9, 9, 18)

        def plane(ch):
            return feats[:, :, ch]

        def gt(*xys):
            g = np.zeros((9, 9), np.float32)
            for x, y in xys:
                g[y, x] = 1.0
            return g

        # white to move: channel 0 = my (white) stones now = (0,3)
        np.testing.assert_array_equal(plane(0), gt((0, 3)))
        # channel 1 = opponent (black) now: (0,0), (0,2), (1,1)
        np.testing.assert_array_equal(plane(1), gt((0, 0), (0, 2), (1, 1)))
        # channel 2 = white 1 move ago: (0,1), (0,3)
        np.testing.assert_array_equal(plane(2), gt((0, 1), (0, 3)))
        # channel 3 = black 1 move ago: (0,0), (0,2)
        np.testing.assert_array_equal(plane(3), gt((0, 0), (0, 2)))
        # channel 4 = white 2 moves ago: (0,1)
        np.testing.assert_array_equal(plane(4), gt((0, 1)))
        # channel 5 = black 2 moves ago: (0,0), (0,2)
        np.testing.assert_array_equal(plane(5), gt((0, 0), (0, 2)))
        # channels 10..15: beyond the 5-entry history -> zero
        for ch in range(10, 16):
            np.testing.assert_array_equal(plane(ch), np.zeros((9, 9)))
        # player indicators: white to move
        np.testing.assert_array_equal(plane(16), np.zeros((9, 9)))
        np.testing.assert_array_equal(plane(17), np.ones((9, 9)))


class TestSymmetryGolden:
    """symmetry_test.cc:73 testInversions on the reference's exact position
    (moves at (0,8) and (1,7)): extraction under every D4 code, inverse-
    transformed, equals the identity extraction."""

    def test_inversions(self):
        from elf_tpu.env.go import state as gostate
        from elf_tpu.env.go.features import extract_agz, transform_planes

        st = gostate.init_state(1, SIZE)
        for (x, y) in ((0, 8), (1, 7)):
            st, _ = gostate.step(st, np.array([y * SIZE + x]), SIZE)
        base = np.asarray(extract_agz(st, jnp.zeros((1,), jnp.int32), SIZE))

        # inverse code table for the D4 encoding used by transform_planes
        for code in range(8):
            f = extract_agz(st, jnp.full((1,), code, jnp.int32), SIZE)
            # planes layout for transform_planes is [B, C, n2]
            fp = jnp.transpose(f, (0, 3, 1, 2)).reshape(1, 18, N2)
            # find the inverse code by round-trip search
            ok = False
            for inv in range(8):
                back = np.asarray(
                    transform_planes(fp, jnp.full((1,), inv, jnp.int32), SIZE)
                ).reshape(1, 18, SIZE, SIZE).transpose(0, 2, 3, 1)
                if np.array_equal(back, base):
                    ok = True
                    break
            assert ok, f"no inverse for D4 code {code}"
