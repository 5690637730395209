"""Tests for the full env state (superko, histories) and feature extraction
(D4 round-trips mirroring the reference `symmetry_test.cc`; plane semantics
vs hand-computed values)."""

import numpy as np
import pytest

from elf_tpu.env.go import features, state as gostate
from elf_tpu.env.go.engine import BLACK, WHITE
from elf_tpu.env.go.features import (
    extract_agz,
    extract_df,
    inv_transform_action,
    inv_transform_policy,
    transform_action,
    transform_planes,
)
from elf_tpu.env.go.state import init_state, step


def play(s, moves, size):
    for m in moves:
        s, info = step(s, np.array([m]), size)
        assert not bool(info.illegal[0]), f"illegal {m}"
    return s


class TestGoState:
    def test_superko_detection(self):
        """A move recreating a recorded pre-move position terminates the
        game as superko, scored for the player to move (go_state.h:194).

        The repeat is induced directly through the hash history (legal
        repetition cycles like triple ko need large constructions; the
        mechanism — position hash vs pre-move history — is what we test)."""
        size = 5
        s = init_state(1, size)
        # play X@12 once to learn its post-move hash
        probe, _ = step(s, np.array([12]), size)
        h_lo = np.asarray(probe.core.hash_lo)
        h_hi = np.asarray(probe.core.hash_hi)
        # seed a fresh state whose history claims that position occurred
        hh_lo = np.asarray(s.hash_hist_lo).copy()
        hh_hi = np.asarray(s.hash_hist_hi).copy()
        hh_lo[:, 0] = h_lo
        hh_hi[:, 0] = h_hi
        s = s._replace(
            hash_hist_lo=hh_lo, hash_hist_hi=hh_hi, nhash=np.array([1], np.int32)
        )
        s, _ = step(s, np.array([12]), size)
        assert bool(s.superko[0])
        assert bool(s.terminated[0])
        # next player (white) wins per go_state.h:194
        v = float(gostate.evaluate(s, size)[0])
        assert v == -1.0

    def test_no_false_superko(self):
        """Distinct positions never collide in a short game."""
        size = 5
        s = init_state(1, size)
        for m in [0, 1, 5, 6, 10, 11]:
            s, info = step(s, np.array([m]), size)
            assert not bool(info.illegal[0])
            assert not bool(s.superko[0])

    def test_frozen_after_termination(self):
        size = 5
        s = init_state(1, size)
        s = play(s, [25, 25], size)
        assert bool(s.terminated[0])
        before = np.asarray(s.core.stones).copy()
        s2, info = step(s, np.array([3]), size)
        np.testing.assert_array_equal(np.asarray(s2.core.stones), before)
        assert int(s2.core.ply[0]) == int(s.core.ply[0])

    def test_reset_where(self):
        size = 5
        s = init_state(2, size)
        s, _ = step(s, np.array([3, 4]), size)
        s2 = gostate.reset_where(s, np.array([True, False]), size)
        assert int(s2.core.ply[0]) == 0
        assert int(s2.core.ply[1]) == 1

    def test_evaluate_tt(self):
        size = 5
        s = init_state(1, size)
        s, _ = step(s, np.array([12]), size)  # single black stone
        s, _ = step(s, np.array([25]), size)
        s, _ = step(s, np.array([25]), size)
        assert bool(s.terminated[0])
        v = float(gostate.evaluate(s, size, komi=7.5)[0])
        assert v == 25 - 7.5


class TestD4:
    @pytest.mark.parametrize("size", [5, 9, 19])
    def test_roundtrip_actions(self, size):
        n2 = size * size
        a = np.arange(n2 + 1)
        for g in range(8):
            codes = np.full((n2 + 1,), g)
            t = np.asarray(transform_action(a, codes, size))
            back = np.asarray(inv_transform_action(t, codes, size))
            np.testing.assert_array_equal(back, a)
            # transforms are permutations of the move space
            assert len(set(t[:-1].tolist())) == n2
            assert t[-1] == n2

    def test_roundtrip_planes(self):
        size = 9
        rng = np.random.RandomState(0)
        planes = rng.rand(8, 3, size * size).astype(np.float32)
        codes = np.arange(8)
        t = np.asarray(transform_planes(planes, codes, size))
        # applying inverse permutation restores
        fwd, inv = features._d4_maps(size)
        for g in range(8):
            restored = t[g][:, np.asarray(fwd)[g]]
            np.testing.assert_allclose(restored, planes[g], rtol=0, atol=0)

    def test_plane_action_consistency(self):
        """A one-hot plane at coord p, transformed with code g, has its 1 at
        transform_action(p, g) — the property symmetry_test.cc verifies."""
        size = 9
        n2 = size * size
        for g in range(8):
            for p in [0, 8, 40, 72, 80, 17]:
                plane = np.zeros((1, 1, n2), np.float32)
                plane[0, 0, p] = 1.0
                t = np.asarray(
                    transform_planes(plane, np.array([g]), size)
                )[0, 0]
                ta = int(np.asarray(transform_action(np.array([p]), np.array([g]), size))[0])
                assert t[ta] == 1.0 and t.sum() == 1.0

    def test_policy_inverse(self):
        size = 5
        n2 = 25
        rng = np.random.RandomState(1)
        pi = rng.rand(8, n2 + 1).astype(np.float32)
        codes = np.arange(8)
        # pi is in transformed frame; map to board frame
        board_pi = np.asarray(inv_transform_policy(pi, codes, size))
        for g in range(8):
            for p in range(n2):
                ta = int(
                    np.asarray(transform_action(np.array([p]), np.array([g]), size))[0]
                )
                assert board_pi[g, p] == pi[g, ta]


class TestFeatures:
    def test_agz_planes_basic(self):
        size = 9
        s = init_state(1, size)
        s, _ = step(s, np.array([40]), size)  # black center
        s, _ = step(s, np.array([41]), size)  # white
        f = np.asarray(extract_agz(s, np.zeros(1, np.int32), size))[0]
        assert f.shape == (size, size, 18)
        r, c = divmod(40, size)
        # to-move is black: plane 0 = my (black) stones now
        assert f[r, c, 0] == 1.0
        assert f[4, 5, 1] == 1.0      # opp (white) stone
        # one move ago (plane 2/3): black stone present, white not yet
        assert f[r, c, 2] == 1.0
        assert f[4, 5, 3] == 0.0
        # two moves ago: empty board
        assert f[:, :, 4].sum() == 0
        # black to move indicator
        assert f[:, :, 16].all() and not f[:, :, 17].any()

    def test_agz_perspective_swap(self):
        size = 9
        s = init_state(1, size)
        s, _ = step(s, np.array([40]), size)
        f = np.asarray(extract_agz(s, np.zeros(1, np.int32), size))[0]
        # white to move: plane 0 = white stones (none), plane 1 = black
        assert f[:, :, 0].sum() == 0
        assert f[4, 4, 1] == 1.0
        assert f[:, :, 17].all() and not f[:, :, 16].any()

    def test_df_planes(self):
        size = 5
        from tests.test_engine import core_from_oracle, make_oracle_from_diagram

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
        s = init_state(1, size)._replace(core=core)
        f = np.asarray(extract_df(s, np.zeros(1, np.int32), size))[0]
        assert f.shape == (size, size, 25)
        # O at (1,1) has exactly 1 liberty (1,2): opp lib==1 plane (3)
        assert f[1, 1, 3] == 1.0
        # X at (0,1): liberties (0,0) -- and chain is single stone, libs
        # (0,0) only? neighbors: (0,0) empty, (0,2)=O, (1,1)=O -> 1 lib
        assert f[0, 1, 0] == 1.0
        # stones planes
        assert f[0, 1, 7] == 1.0 and f[1, 1, 8] == 1.0 and f[3, 3, 9] == 1.0
        # black indicator
        assert f[:, :, 16].all() and not f[:, :, 17].any()
        # distance maps: at a black stone, dist-to-mine == 0
        assert f[0, 1, 14] == 0.0 and f[1, 1, 15] == 0.0
        assert f[4, 4, 14] == 5.0  # L1 dist from (4,4) to nearest X at (2,1)

    def test_df_lib2_lib3(self):
        size = 5
        from tests.test_engine import core_from_oracle, make_oracle_from_diagram

        o = make_oracle_from_diagram(
            """
            X X . . .
            . . . . .
            . . O . .
            . . . . .
            . . . . .
            """,
            to_play=BLACK,
        )
        core = core_from_oracle(o)
        s = init_state(1, size)._replace(core=core)
        f = np.asarray(extract_df(s, np.zeros(1, np.int32), size))[0]
        # X chain (0,0)-(0,1): libs (1,0),(1,1),(0,2) = 3 -> plane 2
        assert f[0, 0, 2] == 1.0 and f[0, 1, 2] == 1.0
        # O at (2,2): 4 libs -> opp >=3 plane (5)
        assert f[2, 2, 5] == 1.0
