"""Ladder-suite behavioral tests: all 116 reference SGF games (real CGOS
19x19 games) must replay through the vectorized engine with every move
legal — a rules-compatibility check against real-world data — and the
probe runner must execute (README.rst:173)."""

import os

import numpy as np
import pytest

from elf_tpu.tools.ladder import (
    DEFAULT_SUITE,
    batch_replay,
    load_moves,
    load_suite,
    run_ladder_suite,
)

suite_exists = os.path.isdir(os.path.join(DEFAULT_SUITE, "ladder"))
pytestmark = pytest.mark.skipif(
    not suite_exists, reason="reference ladder_suite not available"
)


class TestLadderSuite:
    def test_all_games_replay_legally(self):
        sgfs = sorted(
            os.path.join(DEFAULT_SUITE, "ladder", f)
            for f in os.listdir(os.path.join(DEFAULT_SUITE, "ladder"))
            if f.endswith(".sgf")
        )
        assert len(sgfs) == 116
        move_lists = []
        for p in sgfs:
            moves, size = load_moves(p)
            assert size == 19
            assert len(moves) > 10
            move_lists.append(moves)
        illegal, state = batch_replay(move_lists, 19)
        bad = np.argwhere(illegal)
        assert bad.size == 0, (
            f"{len(bad)} illegal moves, first at game {bad[0][0]} "
            f"({os.path.basename(sgfs[bad[0][0]])}) ply {bad[0][1]}"
        )

    def test_probe_runner_executes(self):
        entries = load_suite()
        assert len(entries) > 100

        # a trivial "engine" that always answers pass: runner machinery only
        def gen_pass(state, size):
            return size * size

        res = run_ladder_suite(gen_pass, limit=3)
        assert res.total == 3
        assert res.matched == 0  # pass is never the ladder move
        assert all(f[3] == "pass" for f in res.failures)

    def test_policy_scorecard_oracle_matches_all(self):
        """An oracle policy (one-hot at each probe's expected move) must
        score 100% — validates the scorecard's replay/feature/legal-mask/
        argmax coordinate path end-to-end, so a trained net's low score
        reads as behavior, not a transform bug."""
        import jax.numpy as jnp

        from elf_tpu.tools.ladder import ladder_policy_scorecard

        limit = 6
        entries = load_suite()[:limit]
        expected, size = [], 19
        for sgf_path, n in entries:
            moves, size = load_moves(sgf_path)
            if n < len(moves):
                expected.append(moves[n])

        def oracle(feats, to_play):
            logp = np.full((feats.shape[0], size * size + 1), -20.0,
                           np.float32)
            for i, mv in enumerate(expected):
                logp[i, mv] = 0.0
            return jnp.asarray(logp), jnp.zeros((feats.shape[0],))

        res = ladder_policy_scorecard(oracle, limit=limit)
        assert res.total == len(expected)
        assert res.matched == res.total, res.failures
