"""Full-system integration: actor client -> socket control plane ->
replay/pipeline -> learner train steps -> checkpoint -> version notify ->
eval -> promotion, all in-process with a tiny real model (the reference's
cheat-mode cluster test, SURVEY.md §4, with a real learner attached)."""

import tempfile
import threading
import time

import jax
import numpy as np

from elf_tpu.config import ControlOptions, ReplayOptions, TrainOptions
from elf_tpu.control.client import SelfplayClient
from elf_tpu.control.server import TrainServer
from elf_tpu.models.resnet import ModelConfig
from elf_tpu.search.mcts import MCTSConfig
from elf_tpu.selfplay.actor import ActorConfig, SelfplayActor
from elf_tpu.training.pipeline import TrainingPipeline
from elf_tpu.training.replay import ReplayBuffer
from elf_tpu.training.runner import LearnerRunner
from elf_tpu.training.trainer import Trainer, load_checkpoint


def test_full_actor_learner_loop():
    size = 5
    to = TrainOptions(batchsize=8, num_block=1, dim=16, num_cooldown=1,
                      bf16=False)
    cfg = ModelConfig(board_size=size, num_planes=18, num_block=1, dim=16,
                      use_bf16=False)
    trainer = Trainer(cfg, to)
    template = trainer.init_state(jax.random.PRNGKey(0))
    eval_raw = trainer.make_eval_fn()

    co = ControlOptions(
        expected_num_clients=1, selfplay_init_num=3, selfplay_update_num=2,
        eval_num_games=2, client_max_delay_sec=60,
    )
    ro = ReplayOptions(num_reader=2, q_min_size=1, q_max_size=100)

    with tempfile.TemporaryDirectory() as ckpt_dir:
        replay = ReplayBuffer(ro, seed=0)
        pipeline = TrainingPipeline(replay, size, seed=0)
        runner = LearnerRunner(trainer, pipeline, ckpt_dir, to, seed=0)
        server = TrainServer(co, ro, port=0, record_sink=pipeline.insert_record)
        server.replay = replay
        server.start()
        try:
            server.set_initial_version(int(runner.state.step))  # version 0
            runner.episode_summary()  # write save-0.bin

            def eval_builder(params, batch_stats):
                return lambda feats, to_play: eval_raw(params, batch_stats, feats)

            acfg = ActorConfig(
                board_size=size, batch=2, policy_distri_cutoff=50,
                never_resign_prob=1.0, cheat_selfplay_random_result=True,
            )
            mcfg = MCTSConfig(num_rollouts=4, rollouts_per_batch=2,
                              rotation_flip=False, root_epsilon=0.25,
                              root_alpha=0.5)
            actor = SelfplayActor(acfg, mcfg, eval_builder, seed=5)

            def load_params(ver):
                state = load_checkpoint(
                    f"{ckpt_dir}/save-{ver}.bin", template=template
                )
                return state.params, state.batch_stats

            client = SelfplayClient(co, actor, load_params, port=server.port)

            # client pumps games until the server has enough selfplay
            client.run(
                moves_per_round=10, max_rounds=40,
                stop_fn=lambda: server.num_selfplay_games >= 3,
            )
            assert server.num_selfplay_games >= 3
            assert client.loaded_ver == 0

            # learner trains on the records and publishes a new version
            stats = runner.episode(2)
            assert "loss/total" in stats
            ver = runner.episode_summary()
            assert ver == 2
            server.notify_new_version(0, ver)

            # eval-capable client receives eval jobs; with
            # cheat_eval semantics we just feed wins directly
            from tests.test_control import fake_record
            from elf_tpu.selfplay.records import MsgRequest

            for i in range(2):
                req = MsgRequest()
                assert server.eval.fill_in_request(f"ev{i}", req)
                reward = -1.0 if req.client_ctrl.player_swap else 1.0
                server.eval.feed(f"ev{i}", fake_record(
                    ver=ver, white_ver=0, reward=reward,
                    swap=req.client_ctrl.player_swap,
                ))
            # wait for the sweep thread to promote
            deadline = time.time() + 10
            while time.time() < deadline and server.selfplay.version() != ver:
                time.sleep(0.2)
            assert server.selfplay.version() == ver, "promotion did not happen"
            assert server.eval.baseline == ver

            # a fresh client request now carries the new version (replies
            # are sequenced, record.h:152)
            from elf_tpu.selfplay.records import MsgRequestSeq

            rs = MsgRequestSeq.from_json(server.on_reply("late-client"))
            assert rs.seq == 0
            assert rs.request.vers.black_ver in (ver,)
        finally:
            server.stop()
