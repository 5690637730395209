"""Cross-path feature consistency: the SAME position must produce identical
AGZ planes through all three extraction paths —

  (a) live env state (`extract_agz`, used by the self-play actor),
  (b) training pipeline (native replayer snapshots ->
      `extract_agz_from_snapshots`, used by the learner), and
  (c) raw snapshot assembly mirroring `TrainingPipeline.sample_host_batch`.

A silent train/play feature mismatch makes training actively hurt play
strength while every per-path unit test still passes, so this is the
guard for the reference's implicit invariant that `extractStateAGZ` is the
one extractor both sides share (game_feature.h:102)."""

import numpy as np
import jax.numpy as jnp

from elf_tpu.env.go.features import extract_agz, extract_agz_from_snapshots
from elf_tpu.env.go.state import MAX_AGZ_HISTORY, init_state, step
from elf_tpu.native.replayer import replay_to_snapshots

SIZE = 5
N2 = SIZE * SIZE


def play_moves(moves):
    s = init_state(1, SIZE)
    for a in moves:
        s, info = step(s, np.array([a], np.int32), SIZE)
        assert not bool(np.asarray(info.illegal)[0])
    return s


def pipeline_style_snaps(moves, ply):
    """Exactly TrainingPipeline.sample_host_batch's snapshot assembly."""
    H = MAX_AGZ_HISTORY
    all_snaps = replay_to_snapshots(moves, SIZE)
    snaps = np.zeros((1, H, N2), np.int8)
    valid = np.zeros((1, H), bool)
    n_avail = min(ply, H)
    for j in range(n_avail):
        snaps[0, H - 1 - j] = all_snaps[ply - 1 - j]
        valid[0, H - 1 - j] = True
    to_play = np.array([1 if ply % 2 == 0 else 2], np.int8)
    return snaps, valid, to_play


MOVES = [12, 6, 13, 7, 18, 8, 11, 25, 17, 16]  # incl. a pass (25)


class TestFeatureConsistency:
    def test_live_state_vs_pipeline_snapshots(self):
        for ply in [0, 1, 2, 3, 7, 9, 10]:
            moves = MOVES[:ply]
            state = play_moves(moves)
            codes = np.zeros(1, np.int32)
            f_live = np.asarray(extract_agz(state, codes, SIZE))
            snaps, valid, to_play = pipeline_style_snaps(MOVES, ply)
            assert int(np.asarray(state.core.to_play)[0]) == int(to_play[0])
            f_pipe = np.asarray(
                extract_agz_from_snapshots(
                    jnp.asarray(snaps), jnp.asarray(valid),
                    jnp.asarray(to_play), jnp.asarray(codes), SIZE,
                )
            )
            np.testing.assert_array_equal(
                f_live, f_pipe, err_msg=f"AGZ planes diverge at ply={ply}"
            )

    def test_d4_codes_agree_across_paths(self):
        ply = 7
        state = play_moves(MOVES[:ply])
        snaps, valid, to_play = pipeline_style_snaps(MOVES, ply)
        for code in range(8):
            codes = np.full(1, code, np.int32)
            f_live = np.asarray(extract_agz(state, codes, SIZE))
            f_pipe = np.asarray(
                extract_agz_from_snapshots(
                    jnp.asarray(snaps), jnp.asarray(valid),
                    jnp.asarray(to_play), jnp.asarray(codes), SIZE,
                )
            )
            np.testing.assert_array_equal(
                f_live, f_pipe, err_msg=f"planes diverge under D4 code {code}"
            )

    def test_replayer_snapshot_indexing(self):
        # row k of replay_to_snapshots is the board AFTER move k (0-based):
        # the pipeline's `snapshots[ply-1]` == live board after `ply` moves
        for ply in range(1, len(MOVES) + 1):
            state = play_moves(MOVES[:ply])
            live = np.asarray(state.core.stones)[0]
            snap = replay_to_snapshots(MOVES, SIZE)[ply - 1]
            np.testing.assert_array_equal(live, snap)
