"""Golden tests: vectorized JAX engine vs the pure-Python oracle.

Strategy mirrors the reference's board tests (`base/test/go_test.cc`,
loosely MiniGo-derived): hand-written positions for captures / ko / suicide /
eyes, plus randomized full-game replays where every step cross-checks
board state, legality mask, ko state, hashes-consistency and final score.
"""

import numpy as np
import pytest

from elf_tpu.env.go import engine
from elf_tpu.env.go.engine import (
    BLACK,
    EMPTY,
    WHITE,
    GoCore,
    init_core,
    legal_moves,
    score_tromp_taylor,
    step_core,
)
from elf_tpu.env.go.oracle import OracleGo


def make_oracle_from_diagram(diagram: str, to_play=BLACK, size=None):
    """Build an oracle board from an ASCII diagram ('.', 'X' black, 'O' white)."""
    rows = [r.split() for r in diagram.strip().splitlines()]
    size = size or len(rows)
    o = OracleGo(size)
    for r, row in enumerate(rows):
        for c, ch in enumerate(row):
            p = r * size + c
            if ch == "X":
                o.stones[p] = BLACK
            elif ch == "O":
                o.stones[p] = WHITE
    o.to_play = to_play
    return o


def core_from_oracle(o: OracleGo) -> GoCore:
    core = init_core(1, o.size)
    core = core._replace(
        stones=np.array(o.stones, np.int8)[None],
        to_play=np.array([o.to_play], np.int8),
        ko_point=np.array([-1 if o.ko_point is None else o.ko_point], np.int32),
        ko_color=np.array([o.ko_color], np.int8),
        ko_age=np.array([o.ko_age], np.int32),
        ply=np.array([o.ply], np.int32),
        passes=np.array([o.passes], np.int32),
    )
    return core


def assert_same(core: GoCore, o: OracleGo, b=0, check_legal=True):
    np.testing.assert_array_equal(
        np.asarray(core.stones)[b], np.array(o.stones, np.int8), err_msg="stones"
    )
    assert int(core.to_play[b]) == o.to_play
    assert int(core.ply[b]) == o.ply
    assert int(core.passes[b]) == o.passes
    jko = int(core.ko_point[b]) if int(core.ko_age[b]) == 0 else None
    oko = o.ko_point if o.ko_age == 0 else None
    assert jko == oko, f"ko mismatch {jko} vs {oko}"
    if check_legal and not o.terminated():
        # (superko termination is tracked by the full env, not GoCore)
        lm = np.asarray(legal_moves(core, o.size))[b]
        olm = np.array(o.legal_moves())
        np.testing.assert_array_equal(lm, olm, err_msg="legal mask")


class TestBasics:
    def test_empty_board_all_legal(self):
        core = init_core(2, 9)
        lm = np.asarray(legal_moves(core, 9))
        assert lm.all()

    def test_single_capture(self):
        # white stone with one liberty gets captured
        o = make_oracle_from_diagram(
            """
            . X . . .
            X O . . .
            . X . . .
            . . . . .
            . . . . .
            """,
        )
        core = core_from_oracle(o)
        a = 1 * 5 + 2  # fills white's last liberty
        core2, info = step_core(core, np.array([a]), 5)
        assert o.play(a)
        assert int(info.captured[0]) == 1
        assert not bool(info.illegal[0])
        assert_same(core2, o)

    def test_multi_chain_capture(self):
        o = make_oracle_from_diagram(
            """
            O O X . .
            O O X . .
            X X . . .
            . . . . .
            . . . . .
            """,
        )
        core = core_from_oracle(o)
        # black has surrounded the 2x2 white group except nothing --
        # white group libs: none! Actually check: place black elsewhere first.
        # Simpler: white group at (0,0)-(1,1) has 0 outside libs already?
        # neighbors: (0,2)X (1,2)X (2,0)X (2,1)X -> captured situation can't
        # exist; rebuild: give white one liberty at (0,0) is corner...
        o = make_oracle_from_diagram(
            """
            . O O X .
            X O O X .
            . X X . .
            . . . . .
            . . . . .
            """,
        )
        core = core_from_oracle(o)
        a = 0  # (0,0) captures the 4-stone white block
        core2, info = step_core(core, np.array([a]), 5)
        assert o.play(a)
        assert int(info.captured[0]) == 4
        assert_same(core2, o)

    def test_suicide_illegal(self):
        o = make_oracle_from_diagram(
            """
            . X . . .
            X . X . .
            . X . . .
            . . . . .
            . . . . .
            """,
            to_play=WHITE,
        )
        core = core_from_oracle(o)
        a = 1 * 5 + 1  # center of black diamond: suicide for white
        lm = np.asarray(legal_moves(core, 5))[0]
        assert not lm[a]
        core2, info = step_core(core, np.array([a]), 5)
        assert bool(info.illegal[0])
        np.testing.assert_array_equal(
            np.asarray(core2.stones), np.asarray(core.stones)
        )

    def test_eye_fill_legal_for_owner(self):
        o = make_oracle_from_diagram(
            """
            . X . . .
            X . X . .
            . X . . .
            . . . . .
            . . . . .
            """,
            to_play=BLACK,
        )
        core = core_from_oracle(o)
        a = 1 * 5 + 1
        lm = np.asarray(legal_moves(core, 5))[0]
        assert lm[a]  # black filling own eye is legal (bad, but legal)

    def test_simple_ko(self):
        #  . X O .
        #  X O . O     <- black captures at (1,2), creating ko
        #  . X O .
        o = make_oracle_from_diagram(
            """
            . X O . .
            X O . O .
            . X O . .
            . . . . .
            . . . . .
            """,
            to_play=BLACK,
        )
        core = core_from_oracle(o)
        a = 1 * 5 + 2
        core2, info = step_core(core, np.array([a]), 5)
        assert o.play(a)
        assert bool(info.ko_created[0])
        assert int(core2.ko_point[0]) == 1 * 5 + 1
        assert_same(core2, o)
        # white may not immediately retake
        lm = np.asarray(legal_moves(core2, 5))[0]
        assert not lm[1 * 5 + 1]
        assert not o.is_legal(1 * 5 + 1)
        # after a white move elsewhere + black response, retake is legal
        for mv in [4 * 5 + 4, 4 * 5 + 0]:
            core2, _ = step_core(core2, np.array([mv]), 5)
            assert o.play(mv)
        assert_same(core2, o)
        assert o.is_legal(1 * 5 + 1)

    def test_capture_not_suicide(self):
        # white plays into a point with no libs but captures -> legal
        o = make_oracle_from_diagram(
            """
            O X . . .
            X . X . .
            O X . . .
            . . . . .
            . . . . .
            """,
            to_play=WHITE,
        )
        core = core_from_oracle(o)
        # (1,1) has 0 empty nbrs; white at (1,1)? black chain around has libs
        # Actually white (1,1): neighbors X,X,X,empty(1,3)? no: (1,0)X (0,1)X
        # (2,1)X (1,2)X -> all black, each black stone has other libs ->
        # suicide for white
        lm = np.asarray(legal_moves(core, 5))[0]
        olm = np.array(o.legal_moves())
        np.testing.assert_array_equal(lm, olm)

    def test_pass_and_termination(self):
        core = init_core(1, 5)
        o = OracleGo(5)
        core, _ = step_core(core, np.array([25]), 5)
        o.play(25)
        assert int(core.passes[0]) == 1
        assert not bool(engine.is_terminal_core(core, 5)[0])
        core, _ = step_core(core, np.array([25]), 5)
        o.play(25)
        assert bool(engine.is_terminal_core(core, 5)[0])
        assert o.terminated()

    def test_scoring(self):
        o = make_oracle_from_diagram(
            """
            . X . O .
            . X . O .
            . X . O .
            . X . O .
            . X . O .
            """,
        )
        core = core_from_oracle(o)
        s = int(score_tromp_taylor(core, 5)[0])
        assert s == o.score_tt()
        # black: col0 territory(5) + col1 stones(5) = 10; white: col3(5)+col4(5)=10
        # col2 neutral
        assert s == 0

    def test_scoring_empty_board(self):
        core = init_core(1, 5)
        assert int(score_tromp_taylor(core, 5)[0]) == 0


class TestRandomGames:
    @pytest.mark.parametrize("size,seed", [(5, 0), (5, 1), (9, 2), (9, 3), (19, 4)])
    def test_random_game_replay(self, size, seed):
        """Play a random legal game; check every step against the oracle."""
        rng = np.random.RandomState(seed)
        B = 4  # batch with identical replication to catch batch bugs
        o = OracleGo(size)
        core = init_core(B, size)
        max_steps = min(2 * size * size, 90 if size == 19 else 160)
        for t in range(max_steps):
            olm = o.legal_moves()
            legal_idx = [i for i, v in enumerate(olm) if v]
            # bias away from pass to get meaningful games
            nonpass = [i for i in legal_idx if i != size * size]
            a = rng.choice(nonpass) if nonpass and rng.rand() > 0.02 else size * size
            jlm = np.asarray(legal_moves(core, size))
            for b in range(B):
                np.testing.assert_array_equal(
                    jlm[b], np.array(olm), err_msg=f"legal mask step {t}"
                )
            ok = o.play(int(a))
            assert ok
            core, info = step_core(core, np.full((B,), a), size)
            assert not bool(info.illegal.any())
            # legality compared at the top of the next iteration
            assert_same(core, o, check_legal=False)
            if o.terminated():
                break
        js = np.asarray(score_tromp_taylor(core, size))
        assert int(js[0]) == o.score_tt()

    def test_hash_consistency(self):
        """Same position reached by different orders -> same hash; hash
        changes with every position change."""
        size = 5
        core = init_core(1, size)
        c1, _ = step_core(core, np.array([0]), size)
        c1, _ = step_core(c1, np.array([12]), size)
        c1, _ = step_core(c1, np.array([3]), size)
        c2, _ = step_core(core, np.array([3]), size)
        c2, _ = step_core(c2, np.array([12]), size)
        c2, _ = step_core(c2, np.array([0]), size)
        assert int(c1.hash_lo[0]) == int(c2.hash_lo[0])
        assert int(c1.hash_hi[0]) == int(c2.hash_hi[0])
        assert int(c1.hash_lo[0]) != 0

    def test_capture_hash_roundtrip(self):
        """Capturing and refilling returns hash to a consistent value."""
        size = 5
        o = make_oracle_from_diagram(
            """
            . X . . .
            X O . . .
            . X . . .
            . . . . .
            . . . . .
            """,
        )
        core = core_from_oracle(o)
        # hash of core is 0 here (we didn't accumulate), so play capture:
        c1, info = step_core(core, np.array([7]), size)  # captures white at 6
        assert int(info.captured[0]) == 1
        # board now has black at 1,5,7,11 and empty at 6.
        stones = np.asarray(c1.stones)[0]
        assert stones[6] == EMPTY and stones[7] == BLACK
