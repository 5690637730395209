"""Training pipeline: native replayer parity vs oracle, batch assembly,
learner minibatch + cooldown + checkpoint cycle."""

import tempfile

import numpy as np

from elf_tpu.config import ReplayOptions, TrainOptions
from elf_tpu.env.go.oracle import OracleGo
from elf_tpu.models.resnet import ModelConfig
from elf_tpu.native.replayer import replay_to_snapshots, _get_lib
from elf_tpu.selfplay.records import make_record
from elf_tpu.training.pipeline import TrainingPipeline
from elf_tpu.training.replay import ReplayBuffer
from elf_tpu.training.runner import LearnerRunner
from elf_tpu.training.trainer import Trainer


def random_game(size, seed, max_moves=40):
    rng = np.random.RandomState(seed)
    o = OracleGo(size)
    moves = []
    for _ in range(max_moves):
        legal = [a for a in range(size * size) if o.is_legal(a)]
        if not legal or o.terminated():
            break
        a = int(rng.choice(legal))
        o.play(a)
        moves.append(a)
    return moves, o


class TestReplayer:
    def test_native_lib_builds(self):
        assert _get_lib() is not None, "C replayer failed to build"

    def test_matches_oracle(self):
        for seed in range(4):
            size = 5
            moves, _ = random_game(size, seed)
            snaps = replay_to_snapshots(moves, size)
            o = OracleGo(size)
            for k, a in enumerate(moves):
                assert o.play(a)
                np.testing.assert_array_equal(
                    snaps[k], np.asarray(o.stones, np.int8),
                    err_msg=f"seed {seed} ply {k}",
                )

    def test_19x19(self):
        moves, o = random_game(19, 7, max_moves=120)
        snaps = replay_to_snapshots(moves, 19)
        np.testing.assert_array_equal(
            snaps[-1], np.asarray(o.stones, np.int8)
        )


class TestPipeline:
    def _make_pipeline(self, size=5, games=6):
        buf = ReplayBuffer(ReplayOptions(num_reader=2, q_min_size=1, q_max_size=50))
        pipe = TrainingPipeline(buf, size, seed=0)
        A = size * size + 1
        for seed in range(games):
            moves, o = random_game(size, seed)
            pis = []
            for m in moves:
                p = np.zeros(A, np.float32)
                p[m] = 1.0
                pis.append(p)
            rec = make_record(
                moves, 1.0 if seed % 2 else -1.0, pis,
                [0.0] * len(moves), size,
            )
            pipe.insert_record(rec)
        return pipe

    def test_batch_assembly(self):
        size = 5
        pipe = self._make_pipeline(size)
        hb = pipe.sample_host_batch(8)
        assert hb is not None
        assert hb.snaps.shape == (8, 8, 25)
        # to_play consistent with parity of ply: newest snapshot ply parity
        feats, pi_t, winner = pipe.device_batch(hb)
        f = np.asarray(feats)
        assert f.shape == (8, size, size, 18)
        # policy targets are distributions
        np.testing.assert_allclose(np.asarray(pi_t).sum(1), 1.0, rtol=1e-5)
        # indicator planes match to_play
        for i in range(8):
            if hb.to_play[i] == 1:
                assert f[i, :, :, 16].all()
            else:
                assert f[i, :, :, 17].all()

    def test_learner_cycle(self):
        size = 5
        pipe = self._make_pipeline(size)
        opts = TrainOptions(batchsize=8, num_block=1, dim=16, num_cooldown=2,
                            lr=0.01)
        cfg = ModelConfig(board_size=size, num_planes=18, num_block=1, dim=16,
                          use_bf16=False)
        trainer = Trainer(cfg, opts)
        with tempfile.TemporaryDirectory() as d:
            runner = LearnerRunner(trainer, pipe, d, opts)
            s1 = runner.run_minibatch()
            assert s1 is not None and "loss/total" in s1
            s2 = runner.run_minibatch()
            assert int(runner.state.step) == 2
            ver = runner.episode_summary()
            assert ver == 2
            import os

            assert os.path.exists(os.path.join(d, "save-2.bin"))
            assert os.path.exists(os.path.join(d, "latest"))

    def test_augmentation_consistency(self):
        """Features and policy target transform with the same D4 code: the
        one-hot policy target must sit where the move's stone appears."""
        size = 5
        buf = ReplayBuffer(ReplayOptions(num_reader=2, q_min_size=1, q_max_size=9))
        pipe = TrainingPipeline(buf, size, seed=1)
        A = 26
        # single-move game: black plays 7
        p = np.zeros(A, np.float32)
        p[7] = 1.0
        rec = make_record([7, 12], 1.0, [p, p], [0.0, 0.0], size)
        pipe.insert_record(rec)
        for _ in range(8):
            hb = pipe.sample_host_batch(4)
            feats, pi_t, _ = pipe.device_batch(hb)
            f = np.asarray(feats)
            pt = np.asarray(pi_t)
            for i in range(4):
                # ply 0 sampled: empty board, target one-hot; ply 1: black
                # stone visible in opponent plane (white to move)
                tgt = int(np.argmax(pt[i]))
                if hb.to_play[i] == 1:  # ply 0, black to move, empty board
                    assert f[i, :, :, 0].sum() == 0
                else:  # ply 1: board has black stone at transform(7)
                    r, c = divmod(tgt, size)  # target is transform(12)
                    # black stone is in the *opponent* plane (plane 1)
                    assert f[i, :, :, 1].sum() == 1

    def test_offline_multi_horizon_targets(self):
        """num_future_actions plumbs the offline_a [B, T] targets through
        the pipeline (game_feature.h `offline_a`) into the
        MultiplePrediction train step."""
        import jax

        size = 5
        buf = ReplayBuffer(ReplayOptions(num_reader=2, q_min_size=1,
                                         q_max_size=20))
        pipe = TrainingPipeline(buf, size, seed=0, num_future_actions=3)
        moves = [3, 7, 11, 15]
        A = 26
        pis = []
        for m in moves:
            p = np.zeros(A, np.float32)
            p[m] = 1.0
            pis.append(p)
        pipe.insert_record(make_record(moves, 1.0, pis, [0.0] * 4, size))
        hb = pipe.sample_host_batch(6)
        assert hb.offline_a.shape == (6, 3)
        for i in range(6):
            # horizon 0 must be the move actually played at the sampled ply
            ply = int(np.argmax(hb.offline_a[i, 0] == np.asarray(moves))) \
                if hb.offline_a[i, 0] in moves else None
            assert hb.offline_a[i, 0] in moves
            # horizons beyond game end pad with pass
            if hb.offline_a[i, 0] == 15:
                assert hb.offline_a[i, 1] == 25 and hb.offline_a[i, 2] == 25
        # identity D4 code keeps actions unchanged on device
        hb0 = hb._replace(codes=np.zeros(6, np.int32))
        feats, oa, winner = pipe.device_batch_offline(hb0)
        np.testing.assert_array_equal(np.asarray(oa), hb.offline_a)
        # the offline train step runs end to end
        opts = TrainOptions(batchsize=6, num_block=1, dim=8)
        cfg = ModelConfig(board_size=size, num_planes=18, num_block=1,
                          dim=8, use_bf16=False)
        trainer = Trainer(cfg, opts)
        state = trainer.init_state(jax.random.PRNGKey(0))
        step = jax.jit(trainer.make_offline_train_step())
        state, stats = step(state, feats, oa, winner)
        assert "acc/top1" in stats and np.isfinite(float(stats["loss/total"]))

    def test_handicap_record_training(self):
        """A handicap record (white moves first, setup stones on the board)
        must train with the right mover and boards: the pre-parity-fix
        pipeline inverted mine/theirs planes for every such sample."""
        size = 5
        buf = ReplayBuffer(ReplayOptions(num_reader=2, q_min_size=1,
                                         q_max_size=9))
        pipe = TrainingPipeline(buf, size, seed=3)
        A = 26
        setup_black = [12, 6, 18]      # "handicap" stones
        # white (first_player=2) plays 0, then black plays 1
        p = np.zeros(A, np.float32)
        p[0] = 1.0
        rec = make_record([0, 1], -1.0, [p, p], [0.0, 0.0], size,
                          first_player=2, setup_black=setup_black)
        pipe.insert_record(rec)
        # replayed snapshots include the setup stones from ply 0
        item = buf.sample_many(1)[0]
        assert item.first_player == 2
        for k in range(2):
            for s in setup_black:
                assert item.snapshots[k][s] == 1
        assert item.snapshots[0][0] == 2  # white's first move
        assert item.to_play_at(0) == 2 and item.to_play_at(1) == 1
        for _ in range(8):
            hb = pipe.sample_host_batch(4)
            for i in range(4):
                # ply 0 -> white to move; ply 1 -> black to move
                ply_is_0 = not hb.valid[i].any()
                assert hb.to_play[i] == (2 if ply_is_0 else 1)
                if not ply_is_0:
                    # current board: 3 setup blacks + white stone at 0
                    cur = hb.snaps[i, -1]
                    assert (cur == 1).sum() == 3 and (cur == 2).sum() == 1

    def test_bn_running_stats_update(self):
        """Regression: with the reference's bn_momentum=0 quirk, running
        stats must still track batch statistics (a frozen-at-init BN made
        trained models lose to their random init at inference)."""
        import jax
        import jax.numpy as jnp

        size = 5
        pipe = self._make_pipeline(size)
        opts = TrainOptions(batchsize=8, num_block=1, dim=16, bn_momentum=0.0)
        cfg = ModelConfig(board_size=size, num_planes=18, num_block=1, dim=16,
                          use_bf16=False, bn_momentum=0.0)
        assert cfg.flax_bn_momentum < 1.0
        trainer = Trainer(cfg, opts)
        state = trainer.init_state(jax.random.PRNGKey(0))
        mean0 = np.asarray(
            jax.tree.leaves(state.batch_stats)[0]
        ).copy()
        step = jax.jit(trainer.make_train_step())
        for _ in range(3):
            hb = pipe.sample_host_batch(8)
            feats, pi_t, winner = pipe.device_batch(hb)
            state, _ = step(state, feats, pi_t, winner)
        mean1 = np.asarray(jax.tree.leaves(state.batch_stats)[0])
        assert not np.allclose(mean0, mean1), "BN running stats frozen"
