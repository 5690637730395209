"""Handicap placement tests (go_state.cc:33 HandicapTable semantics)."""

import numpy as np

from elf_tpu.env.go.engine import BLACK, WHITE
from elf_tpu.env.go.state import apply_handicap, init_state


class TestHandicap:
    def test_two_stones_19(self):
        s = init_state(1, 19)
        s = apply_handicap(s, 2, 19)
        stones = np.asarray(s.core.stones)[0]
        # reference s2c semantics: D4 -> (3,3), Q16 -> (15,15) — verified
        # bit-exactly against the compiled reference library
        # (tests/golden/ref_traj_19.jsonl.gz handicap games)
        for flat in (3 * 19 + 3, 15 * 19 + 15):
            assert stones[flat] == BLACK
        assert (stones == BLACK).sum() == 2
        # white moves first after handicap; game counters fresh
        assert int(s.core.to_play[0]) == WHITE
        assert int(s.core.ply[0]) == 0
        assert not bool(s.terminated[0])

    def test_nine_stones(self):
        s = apply_handicap(init_state(1, 19), 9, 19)
        assert int((np.asarray(s.core.stones)[0] == BLACK).sum()) == 9

    def test_zero_handicap_noop(self):
        s = apply_handicap(init_state(1, 19), 0, 19)
        assert int((np.asarray(s.core.stones) != 0).sum()) == 0
        assert int(s.core.to_play[0]) == BLACK

    def test_small_board_skips_offboard(self):
        # 9x9: D4/Q16 etc. -- Q/16 off-board entries skipped, D4 fits
        s = apply_handicap(init_state(1, 9), 2, 9)
        stones = np.asarray(s.core.stones)[0]
        assert stones[3 * 9 + 3] == BLACK  # D4 fits; Q16 off-board
        assert (stones == BLACK).sum() >= 1
