"""Golden ladder-reading parity: elf_tpu's native ladder solver
(native/ladder.c) must reproduce the REFERENCE'S OWN ladder search
(`checkLadder`/`checkLadderUseSearch`, board.cc:300-521, compiled by
tools/golden_ref/gen_ladder_golden.cc) move-for-move:

 - random 9x9 / 19x19 positions: every move passing checkLadder's
   two-empty-neighbor gate, exact depth equality (including 0s — the
   shape preconditions and the escape/block search must all agree);
 - the reference's own ladder_suite probe positions (116 scenarios /
   173 listed moves, README.rst:173), before and after each probe.
"""

import gzip
import json
import os

import numpy as np
import pytest

from elf_tpu.native.ladder import (
    classify_ladder_move,
    ladder_capture_depth,
    ladder_escape_depth,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load_fixture(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not generated")
    with gzip.open(path, "rt") as f:
        return [json.loads(line) for line in f if line.strip()]


def check_records(records):
    n_moves = 0
    n_nonzero = 0
    for rec in records:
        stones = np.frombuffer(
            rec["stones"].encode(), np.uint8
        ).astype(np.int8) - ord("0")
        size = int(np.sqrt(stones.size))
        for move, want in rec["depths"]:
            got = ladder_escape_depth(
                stones, move, rec["player"], size,
                ko_point=rec["ko_point"], ko_color=rec["ko_color"],
            )
            assert got == want, (
                f"ladder depth mismatch at move {move} "
                f"(player {rec['player']}): ours {got} vs reference {want}"
            )
            n_moves += 1
            n_nonzero += want > 0
    return n_moves, n_nonzero


class TestGoldenLadder:
    def test_random_9(self):
        n, nz = check_records(load_fixture("ref_ladder_rand_9.jsonl.gz"))
        assert n > 500 and nz >= 10

    def test_random_19(self):
        n, nz = check_records(load_fixture("ref_ladder_rand_19.jsonl.gz"))
        assert n > 500 and nz >= 50

    def test_ladder_suite_probes(self):
        """The 116-scenario ladder_suite, scanned with the reference's
        own solver at every listed probe: exact agreement (the suite's
        ladders mostly FAIL — breakers are present — which is exactly
        what makes them reading problems; agreeing on the zeros is the
        hard part)."""
        n, _ = check_records(load_fixture("ref_ladder_suite_19.jsonl.gz"))
        assert n > 400


class TestLadderSolverBehavior:
    """Hand-built positions: the solver captures working ladders and
    respects breakers on BOTH chase diagonals."""

    def _base(self, size=9):
        def pt(r, c):
            return r * size + c

        stones = np.zeros(size * size, np.int8)
        stones[pt(4, 4)] = 2                       # victim stone in atari
        for p in (pt(3, 4), pt(4, 3), pt(5, 4), pt(4, 6)):
            stones[p] = 1                          # surrounding + driver
        return stones, pt

    def test_working_ladder_and_breakers(self):
        size = 9
        stones, pt = self._base(size)
        escape = pt(4, 5)
        assert ladder_escape_depth(stones, escape, 2, size) > 0
        # breaker on one diagonal: the capturer chases the other
        s1 = stones.copy()
        s1[pt(7, 7)] = 2
        assert ladder_escape_depth(s1, escape, 2, size) > 0
        # breakers on both diagonals: the ladder fails
        s2 = s1.copy()
        s2[pt(1, 7)] = 2
        assert ladder_escape_depth(s2, escape, 2, size) == 0

    def test_capture_classification(self):
        size = 9
        stones, pt = self._base(size)
        stones[pt(4, 5)] = 2                       # victim extended: 2 libs
        for m in (pt(3, 5), pt(5, 5)):             # either atari works
            assert ladder_capture_depth(stones, m, 1, size) > 0
            assert classify_ladder_move(stones, m, 1, size) == "capture"
        # a random far-away move starts nothing
        assert classify_ladder_move(stones, pt(0, 0), 1, size) == "none"
