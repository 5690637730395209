"""Offline loader + model registry + policy-net tests: SGF bulk load into
the pipeline (using the reference ladder suite as real data), supervised
batch assembly, and the df policy-only network forward."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elf_tpu.config import ReplayOptions
from elf_tpu.models.policy_net import PolicyNet, PolicyNetConfig, init_policy_net
from elf_tpu.models.registry import get_model_family
from elf_tpu.training.offline import OfflineLoader, record_from_sgf
from elf_tpu.training.pipeline import TrainingPipeline
from elf_tpu.training.replay import ReplayBuffer

SUITE = "/root/reference/ladder_suite/ladder"
suite_exists = os.path.isdir(SUITE)


class TestOfflineLoader:
    @pytest.mark.skipif(not suite_exists, reason="ladder suite not available")
    def test_bulk_sgf_load(self):
        buf = ReplayBuffer(ReplayOptions(num_reader=2, q_min_size=1,
                                         q_max_size=200))
        pipe = TrainingPipeline(buf, 19, seed=0)
        loader = OfflineLoader(pipe, num_threads=8)
        n = loader.load_dir(SUITE, limit=20)
        assert n == 20
        hb = pipe.sample_host_batch(16)
        assert hb is not None
        feats, pi_t, winner = pipe.device_batch(hb)
        assert np.asarray(feats).shape == (16, 19, 19, 18)
        # supervised targets are one-hot
        pt = np.asarray(pi_t)
        np.testing.assert_allclose(pt.max(axis=1), 1.0)

    def test_record_from_sgf_result(self):
        rec = record_from_sgf("(;GM[1]SZ[5]RE[W+3.5];B[aa];W[bb])")
        assert rec is not None
        assert rec.result.reward == -1.0
        assert rec.result.num_move == 2
        assert record_from_sgf("not sgf at all") is None

    def test_json_roundtrip_load(self, tmp_path):
        import json

        rec = record_from_sgf("(;GM[1]SZ[5]RE[B+1.5];B[aa];W[bb];B[cc])")
        p = tmp_path / "recs.jsonl"
        p.write_text(json.dumps(rec.to_json()) + "\n")
        buf = ReplayBuffer(ReplayOptions(num_reader=2, q_min_size=1,
                                         q_max_size=10))
        pipe = TrainingPipeline(buf, 5, seed=0)
        loader = OfflineLoader(pipe)
        assert loader.load_paths([str(p)]) == 1


class TestPolicyNet:
    def test_forward_shapes(self):
        cfg = PolicyNetConfig(board_size=9, num_planes=25, num_layer=3,
                              dim=16, num_future_actions=3, use_bf16=False)
        params, bstats = init_policy_net(cfg, jax.random.PRNGKey(0))
        model = PolicyNet(cfg)
        x = jnp.zeros((2, 9, 9, 25))
        log_pis = model.apply(
            {"params": params, "batch_stats": bstats}, x, train=False
        )
        assert log_pis.shape == (2, 3, 82)
        np.testing.assert_allclose(
            np.exp(np.asarray(log_pis)).sum(axis=2), 1.0, rtol=1e-5
        )

    def test_registry(self):
        fam = get_model_family("df_policy")
        assert fam.model_cls is PolicyNet
        assert fam.feature_set == "df"
        fam = get_model_family("df_kl")
        assert fam.feature_set == "agz"
        with pytest.raises(KeyError):
            get_model_family("bogus")


class TestMakeTrainer:
    def test_families_compose(self):
        """make_trainer (the load_env composition) builds family-correct
        trainers: df_kl -> mcts mode / 18 planes, df_pred -> offline
        mode, df upgrade via --use_df_feature."""
        from elf_tpu.config import TrainOptions
        from elf_tpu.models.registry import make_trainer

        to = TrainOptions(batchsize=8, num_block=1, dim=8)
        tr, mode, fs = make_trainer("df_kl", 5, to)
        assert (mode, fs) == ("mcts", "agz")
        assert tr.cfg.num_planes == 18
        tr, mode, fs = make_trainer("df_pred", 5, to)
        assert (mode, fs) == ("offline", "agz")
        tr, mode, fs = make_trainer("df_kl", 5, to, use_df_feature=True)
        assert fs == "df" and tr.cfg.num_planes == 25
        with pytest.raises(ValueError):
            make_trainer("df_policy", 5, to)

    def test_offline_runner_trains(self, tmp_path):
        """A df_pred LearnerRunner takes supervised minibatches from the
        pipeline's offline_a targets end-to-end."""
        import numpy as np

        from elf_tpu.config import ReplayOptions, TrainOptions
        from elf_tpu.models.registry import make_trainer
        from elf_tpu.selfplay.records import make_record
        from elf_tpu.training.pipeline import TrainingPipeline
        from elf_tpu.training.replay import ReplayBuffer
        from elf_tpu.training.runner import LearnerRunner

        size = 5
        to = TrainOptions(batchsize=4, num_block=1, dim=8, num_cooldown=0)
        trainer, mode, fs = make_trainer("df_pred", size, to)
        replay = ReplayBuffer(
            ReplayOptions(num_reader=2, q_min_size=1, q_max_size=10), seed=0
        )
        pipeline = TrainingPipeline(replay, size, seed=0, feature_set=fs,
                                    num_future_actions=2)
        rec = make_record([12, 6, 18, 8], 1.0, [None] * 4, [0.0] * 4, size)
        for _ in range(4):
            pipeline.insert_record(rec)
        runner = LearnerRunner(trainer, pipeline, str(tmp_path), to,
                               train_mode=mode)
        stats = runner.run_minibatch()
        assert stats is not None and "acc/top1" in stats
        assert int(runner.state.step) == 1

    def test_offline_runner_trains_df(self, tmp_path):
        """df_pred + --use_df_feature: the supervised runner must feed
        25-plane df batches (device_batch_offline honors feature_set)."""
        from elf_tpu.config import ReplayOptions, TrainOptions
        from elf_tpu.models.registry import make_trainer
        from elf_tpu.selfplay.records import make_record
        from elf_tpu.training.pipeline import TrainingPipeline
        from elf_tpu.training.replay import ReplayBuffer
        from elf_tpu.training.runner import LearnerRunner

        size = 5
        to = TrainOptions(batchsize=4, num_block=1, dim=8, num_cooldown=0)
        trainer, mode, fs = make_trainer("df_pred", size, to,
                                         use_df_feature=True)
        assert fs == "df" and trainer.cfg.num_planes == 25
        replay = ReplayBuffer(
            ReplayOptions(num_reader=2, q_min_size=1, q_max_size=10), seed=0
        )
        pipeline = TrainingPipeline(replay, size, seed=0, feature_set=fs)
        rec = make_record([12, 6, 18, 8], 1.0, [None] * 4, [0.0] * 4, size)
        for _ in range(4):
            pipeline.insert_record(rec)
        runner = LearnerRunner(trainer, pipeline, str(tmp_path), to,
                               train_mode=mode)
        stats = runner.run_minibatch()
        assert stats is not None and "acc/top1" in stats
