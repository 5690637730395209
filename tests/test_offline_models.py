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
