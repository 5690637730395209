"""Control-plane integration: server + client over real sockets in-process,
exercising the full request/record/eval/promotion loop with cheat modes —
the reference's integration strategy (`--cheat_selfplay_random_result`,
game.py:243, SURVEY.md §4) without needing trained models."""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from elf_tpu.config import ControlOptions, ReplayOptions
from elf_tpu.control.client import SelfplayClient
from elf_tpu.control.client_manager import ClientManager, ClientType
from elf_tpu.control.eval_ctrl import EvalSubCtrl, WinEstimate
from elf_tpu.control.selfplay_ctrl import ResignThresholdCalculator, SelfPlaySubCtrl
from elf_tpu.control.server import TrainServer
from elf_tpu.search.mcts import MCTSConfig
from elf_tpu.selfplay.actor import ActorConfig, SelfplayActor
from elf_tpu.selfplay.records import (
    ClientCtrl,
    ModelPair,
    MsgRequest,
    MsgResult,
    Record,
)


def fake_record(ver=0, white_ver=-1, reward=1.0, swap=False, values=None,
                never_resign=False):
    return Record(
        request=MsgRequest(
            vers=ModelPair(black_ver=ver, white_ver=white_ver),
            client_ctrl=ClientCtrl(player_swap=swap),
        ),
        result=MsgResult(
            reward=reward,
            content="(;B[aa])",
            num_move=1,
            values=values or [0.5],
            black_never_resign=never_resign,
            white_never_resign=never_resign,
        ),
    )


class TestWireProtocol:
    def test_ts_options_roundtrip(self):
        from elf_tpu.selfplay.records import TSOptions

        ts = TSOptions(num_threads=8, num_rollouts_per_thread=200,
                       root_epsilon=0.25, root_alpha=0.03, c_puct=0.85,
                       persistent_tree=True, virtual_loss=5)
        d = ts.to_json()
        # reference field layout: alg_opt nests c_puct
        assert d["alg_opt"]["c_puct"] == 0.85
        assert "c_puct" not in d
        ts2 = TSOptions.from_json(d)
        assert ts2 == ts
        assert ts2.total_rollouts == 1600
        nf = ts2.noise_free()
        assert nf.root_epsilon == 0.0 and nf.root_alpha == 0.0
        assert nf.total_rollouts == 1600

    def test_model_pair_mcts_opt_roundtrip(self):
        from elf_tpu.selfplay.records import TSOptions

        mp = ModelPair(black_ver=3, white_ver=-1,
                       mcts_opt=TSOptions(num_threads=2))
        mp2 = ModelPair.from_json(mp.to_json())
        assert mp2.mcts_opt is not None
        assert mp2.mcts_opt.num_threads == 2
        # reference records without mcts_opt still parse
        assert ModelPair.from_json({"black_ver": 1, "white_ver": -1}).mcts_opt is None

    def test_msg_request_seq_roundtrip(self):
        from elf_tpu.selfplay.records import MsgRequestSeq

        rs = MsgRequestSeq(seq=7, request=MsgRequest(
            vers=ModelPair(black_ver=1)))
        rs2 = MsgRequestSeq.from_json(rs.to_json())
        assert rs2.seq == 7 and rs2.request.vers.black_ver == 1

    def test_server_sequences_and_drives_mcts(self):
        """The server ships mcts_opt in every request (noise-free for eval
        jobs, ctrl_eval.h:233) and sequences replies per client."""
        from elf_tpu.selfplay.records import MsgRequestSeq, TSOptions

        opts = ControlOptions(expected_num_clients=2, eval_num_games=4,
                              selfplay_async=True)
        ropts = ReplayOptions(num_reader=2, q_min_size=1, q_max_size=50)
        ts = TSOptions(num_threads=8, num_rollouts_per_thread=25,
                       root_epsilon=0.25, root_alpha=0.03)
        server = TrainServer(opts, ropts, port=0, mcts_opt=ts)
        try:
            server.set_initial_version(0)
            # client c_eval polls twice: seq increments
            r0 = MsgRequestSeq.from_json(server.on_reply("c_eval"))
            r1 = MsgRequestSeq.from_json(server.on_reply("c_eval"))
            assert (r0.seq, r1.seq) == (0, 1)
            # selfplay request: noise + async flag from the server
            assert r0.request.vers.is_selfplay()
            assert r0.request.vers.mcts_opt.root_epsilon == 0.25
            assert r0.request.client_ctrl.async_mode
            # queue a candidate: the eval-capable client gets a noise-free
            # eval job
            server.eval.add_new_model_for_evaluation(10)
            r2 = MsgRequestSeq.from_json(server.on_reply("c_eval"))
            assert not r2.request.vers.is_selfplay()
            assert r2.request.vers.black_ver == 10
            assert r2.request.vers.mcts_opt.root_epsilon == 0.0
            assert r2.request.vers.mcts_opt.total_rollouts == 200
        finally:
            server.stop()

    def test_eval_per_game_accounting(self):
        """A single [B]-board client settles MANY eval games per half — the
        per-identity accounting discarded B-1 lockstep records and made a
        400-game eval unfinishable for small fleets (fair_pick.h:129)."""
        from elf_tpu.control.eval_ctrl import BatchRequest

        br = BatchRequest(max_num_request=8)
        assert br.register("c0")
        for k in range(8):
            assert br.add_result("c0", 1.0 if k % 2 else -1.0)
        assert br.is_full()
        assert not br.add_result("c0", 1.0)   # half full: overshoot dropped
        assert not br.register("c1")
        assert br.win_count.n_done == 8

    def test_single_client_finishes_whole_eval(self):
        """A 1-client fleet must be able to finish a full eval on its own
        (impossible under per-identity accounting)."""
        opts = ControlOptions(eval_num_games=8, eval_winrate_thres=0.55)
        ev = EvalSubCtrl(opts)
        ev.set_baseline(0)
        ev.add_new_model_for_evaluation(1)
        swaps = []
        for _ in range(8):
            req = MsgRequest()
            assert ev.fill_in_request("only-client", req)
            swaps.append(req.client_ctrl.player_swap)
            reward = -1.0 if req.client_ctrl.player_swap else 1.0
            ev.feed("only-client", fake_record(
                ver=1, white_ver=0, reward=reward,
                swap=req.client_ctrl.player_swap,
            ))
        assert sum(swaps) == 4  # both halves covered for color balance
        # sticky assignment: one contiguous block per half, not
        # alternation (a flip per request would re-color the client's
        # multi-round lockstep games mid-flight)
        assert swaps == sorted(swaps) or swaps == sorted(swaps, reverse=True)
        promoted = ev.check_promotions(lambda _ident: False)
        assert promoted == 1

    def test_eval_half_sticky_until_full(self):
        """A registered client keeps its swap half across requests until
        that half fills (fair_pick.h registration persistence): flipping
        per request would re-color in-flight games and corrupt reward
        attribution — the bug the 9x9 production run exposed (candidates
        measured at ~0.25 winrate while the learner's loss fell)."""
        opts = ControlOptions(eval_num_games=8, eval_winrate_thres=0.55)
        ev = EvalSubCtrl(opts)
        ev.set_baseline(0)
        ev.add_new_model_for_evaluation(1)
        # many requests, NO results settled yet: assignment must not move
        swaps = []
        for _ in range(5):
            req = MsgRequest()
            assert ev.fill_in_request("c0", req)
            swaps.append(req.client_ctrl.player_swap)
        assert len(set(swaps)) == 1
        # fill that half -> the next request moves to the other half
        for _ in range(4):
            ev.feed("c0", fake_record(
                ver=1, white_ver=0, reward=1.0, swap=swaps[0]))
        req = MsgRequest()
        assert ev.fill_in_request("c0", req)
        assert req.client_ctrl.player_swap != swaps[0]
        # a second client starts on the other half for color balance
        ev2 = EvalSubCtrl(opts)
        ev2.set_baseline(0)
        ev2.add_new_model_for_evaluation(1)
        r1, r2 = MsgRequest(), MsgRequest()
        assert ev2.fill_in_request("a", r1)
        assert ev2.fill_in_request("b", r2)
        assert r1.client_ctrl.player_swap != r2.client_ctrl.player_swap

    def test_pending_candidates_rekeyed_after_promotion(self):
        """Candidates still queued when the baseline moves must be
        evaluated against the NEW baseline, not orphaned with an
        unreachable old-baseline ModelPerf."""
        opts = ControlOptions(eval_num_games=4, eval_winrate_thres=0.55)
        ev = EvalSubCtrl(opts)
        ev.set_baseline(0)
        ev.add_new_model_for_evaluation(1)
        ev.add_new_model_for_evaluation(2)  # queued behind 1
        # promote 1 -> baseline 1; candidate 2 must stay evaluable
        ev.set_baseline(1)
        req = MsgRequest()
        assert ev.fill_in_request("c0", req)
        assert req.vers.black_ver == 2
        assert req.vers.white_ver == 1

    def test_eval_job_change_restarts_client_games(self):
        """Client-side eval restart matrix (game_selfplay.cc:164-184): a
        changed candidate/baseline/swap assignment resets the eval
        actor's in-flight games so records are scored under the exact
        assignment they were played with."""
        from elf_tpu.selfplay.records import ClientCtrl, ModelPair

        opts = ControlOptions()
        acfg = ActorConfig(board_size=5, batch=2)
        mcfg = MCTSConfig(num_rollouts=4, rollouts_per_batch=2)
        actor = SelfplayActor(acfg, mcfg, lambda p, b: None)
        eval_actor = SelfplayActor(acfg, mcfg, lambda p, b: None)
        client = SelfplayClient(
            opts, actor, load_params_fn=lambda ver: (None, None),
            port=1, eval_actor=eval_actor,
        )
        resets = []
        eval_actor.reset_all = lambda: resets.append(1)
        eval_actor.play_moves = lambda *a, **k: []

        def req(swap, black=1, white=0):
            r = MsgRequest(vers=ModelPair(black_ver=black, white_ver=white),
                           client_ctrl=ClientCtrl(player_swap=swap))
            return r

        client.request = req(False)
        client._play_eval_round(4)
        assert len(resets) == 1          # fresh job: restart once
        client._play_eval_round(4)
        assert len(resets) == 1          # same job: games keep running
        client.request = req(True)
        client._play_eval_round(4)
        assert len(resets) == 2          # swap flipped: restart
        client.request = req(True, black=2)
        client._play_eval_round(4)
        assert len(resets) == 3          # new candidate: restart

    def test_eval_round_with_pruned_checkpoint_skips_not_dies(self):
        """A queued eval candidate can outlive its checkpoint (server
        keep-k pruning).  The client must skip the round and keep
        serving, not crash — found live by tests/test_multiprocess.py::
        test_distributed_learner_promotes, where the dead client starved
        the whole control plane."""
        from elf_tpu.selfplay.records import ClientCtrl, ModelPair

        opts = ControlOptions()
        acfg = ActorConfig(board_size=5, batch=2)
        mcfg = MCTSConfig(num_rollouts=4, rollouts_per_batch=2)
        actor = SelfplayActor(acfg, mcfg, lambda p, b: None)
        eval_actor = SelfplayActor(acfg, mcfg, lambda p, b: None)

        def load_params(ver):
            raise FileNotFoundError(f"save-{ver}.bin pruned")

        client = SelfplayClient(
            opts, actor, load_params_fn=load_params,
            port=1, eval_actor=eval_actor,
        )
        played = []
        eval_actor.play_moves = lambda *a, **k: played.append(1) or []
        client.request = MsgRequest(
            vers=ModelPair(black_ver=8, white_ver=4),
            client_ctrl=ClientCtrl(player_swap=False),
        )
        assert client._play_eval_round(4) == []
        assert not played                # round skipped, no crash

    def test_ts_options_from_search_options(self):
        """The production server builds its wire TSOptions from the same
        --num_rollouts/--c_puct/... flags it parses (train_server.py)."""
        from elf_tpu.config import MCTSOptions
        from elf_tpu.selfplay.records import TSOptions

        mo = MCTSOptions(num_rollouts=1600, rollouts_per_batch=8,
                         c_puct=0.85, virtual_loss=5, root_epsilon=0.25,
                         root_alpha=0.03, persistent_tree=True)
        ts = TSOptions.from_search_options(mo)
        assert ts.total_rollouts == 1600
        assert ts.num_rollouts_per_batch == 8
        assert ts.c_puct == 0.85
        assert ts.virtual_loss == 5
        assert ts.root_epsilon == 0.25
        assert ts.persistent_tree
        # survives the wire
        assert TSOptions.from_json(ts.to_json()) == ts

    def test_client_eval_obeys_server_options_and_thread_cap(self):
        """A client launched with deliberately WRONG local eval noise plays
        eval games noise-free — and on the server-capped number of boards —
        because the server's request says so (ctrl_eval.h:233 noise strip,
        ctrl_eval.h:140 num_game_thread_used), not because of any local
        configuration."""
        from elf_tpu.selfplay.records import MsgRequestSeq, TSOptions

        # expected=2: the first client gets eval duty (alloc_type ratio)
        opts = ControlOptions(expected_num_clients=2, eval_num_games=4,
                              eval_num_threads=2)
        ropts = ReplayOptions(num_reader=2, q_min_size=1, q_max_size=50)
        ts = TSOptions(num_threads=1, num_rollouts_per_thread=16,
                       num_rollouts_per_batch=4,
                       root_epsilon=0.25, root_alpha=0.03)
        server = TrainServer(opts, ropts, port=0, mcts_opt=ts)
        try:
            server.set_initial_version(0)
            server.eval.add_new_model_for_evaluation(1)

            acfg = ActorConfig(board_size=5, batch=4)
            # deliberately wrong local settings: noisy eval MCTS
            wrong = MCTSConfig(num_rollouts=8, rollouts_per_batch=2,
                               root_epsilon=0.77, root_alpha=0.5)
            actor = SelfplayActor(acfg, wrong, lambda p, b: None)
            eval_actor = SelfplayActor(acfg, wrong, lambda p, b: None)
            client = SelfplayClient(
                opts, actor, load_params_fn=lambda ver: (None, None),
                port=server.port, eval_actor=eval_actor,
            )
            req = MsgRequestSeq.from_json(
                server.on_reply(client.identity)
            ).request
            assert not req.vers.is_selfplay()
            client._maybe_reload(req)
            # server's noise-free options landed on the EVAL actor
            assert eval_actor.mcts_cfg.root_epsilon == 0.0
            assert eval_actor.mcts_cfg.num_rollouts == 16
            # ...as did the board cap; the selfplay actor is untouched
            assert eval_actor.active_boards == 2
            assert actor.active_boards is None
            assert actor.mcts_cfg.root_epsilon == 0.77
        finally:
            server.stop()

    def test_actor_applies_ts_options(self):
        from elf_tpu.selfplay.records import TSOptions
        from elf_tpu.search.mcts import MCTSConfig

        actor = SelfplayActor(
            ActorConfig(board_size=5, batch=2),
            MCTSConfig(num_rollouts=8, rollouts_per_batch=2),
            eval_fn_builder=lambda p, b: None,
        )
        ts = TSOptions(num_threads=2, num_rollouts_per_thread=8,
                       num_rollouts_per_batch=4, root_epsilon=0.25,
                       c_puct=0.85, persistent_tree=True)
        assert actor.apply_ts_options(ts)
        assert actor.mcts_cfg.num_rollouts == 16
        assert actor.mcts_cfg.c_puct == 0.85
        assert actor.cfg.persistent_tree
        # idempotent: same options -> no rebuild
        assert not actor.apply_ts_options(ts)


class TestSubControllers:
    def test_selfplay_version_gate(self):
        opts = ControlOptions(selfplay_init_num=2, selfplay_update_num=3)
        sp = SelfPlaySubCtrl(opts)
        sp.set_version(5)
        assert not sp.feed(fake_record(ver=4))   # stale version rejected
        assert sp.feed(fake_record(ver=5))
        assert sp.num_games() == 1
        assert not sp.is_sufficient(initial=True)
        assert sp.feed(fake_record(ver=5))
        assert sp.is_sufficient(initial=True)

    def test_learner_selfplay_coupling(self):
        """game_ctrl.h:72/122: a slow client fleet throttles the learner —
        notify_new_version blocks until enough fresh games of the current
        selfplay version arrive."""
        opts = ControlOptions(expected_num_clients=1, selfplay_init_num=2,
                              selfplay_update_num=2, eval_num_games=8)
        ropts = ReplayOptions(num_reader=2, q_min_size=1, q_max_size=50)
        server = TrainServer(opts, ropts, port=0)
        try:
            server.set_initial_version(0)
            from elf_tpu.selfplay.records import Records

            def feed(n):
                recs = Records(
                    identity="c0", states={},
                    records=[fake_record(ver=0,
                                         reward=1.0 if k % 2 else -1.0)
                             for k in range(n)],
                )
                server.on_receive("c0", "content", recs.to_json_string())

            feed(2)
            # initial gate passes and counts as weight update 0
            assert server.wait_for_sufficient_selfplay(timeout=5, poll=0.05)

            unblocked = threading.Event()

            def learner():
                server.notify_new_version(0, 100)
                unblocked.set()

            t = threading.Thread(target=learner, daemon=True)
            t.start()
            # bar is now init+update = 4 games; only 2 arrived -> blocked
            assert not unblocked.wait(1.0), "learner was not throttled"
            feed(2)
            assert unblocked.wait(10.0), "learner did not unblock"
            t.join(5)
            # the candidate got queued for evaluation
            assert server.eval.info()
        finally:
            server.stop()

    def test_stale_batch_skipped(self):
        """train.py:70-78: after a promotion (keep_prev_selfplay=False) the
        learner skips in-flight batches from the old version."""
        from elf_tpu.training.pipeline import TrainingPipeline
        from elf_tpu.training.replay import ReplayBuffer
        from elf_tpu.training.runner import LearnerRunner
        from elf_tpu.training.trainer import Trainer
        from elf_tpu.config import TrainOptions
        from elf_tpu.models.resnet import ModelConfig
        from elf_tpu.selfplay.records import make_record

        size = 5
        buf = ReplayBuffer(ReplayOptions(num_reader=2, q_min_size=1,
                                         q_max_size=20))
        pipe = TrainingPipeline(buf, size, seed=0)
        A = size * size + 1
        pi = np.zeros(A, np.float32)
        pi[3] = 1.0
        req = MsgRequest(vers=ModelPair(black_ver=0, white_ver=-1))
        for k in range(4):
            pipe.insert_record(make_record(
                [3, 7], 1.0 if k % 2 else -1.0, [pi, pi], [0.0, 0.0], size,
                request=req,
            ))
        opts = TrainOptions(batchsize=4, num_block=1, dim=8)
        cfg = ModelConfig(board_size=size, num_planes=18, num_block=1,
                          dim=8, use_bf16=False)
        runner = LearnerRunner(Trainer(cfg, opts), pipe, "/tmp", opts)
        cur_ver = [0]
        runner.version_provider = lambda: cur_ver[0]
        runner.keep_prev_selfplay = False
        assert runner.run_minibatch() is not None       # fresh: trains
        cur_ver[0] = 5                                   # promotion happened
        assert runner.run_minibatch() is None            # stale: skipped
        assert runner.skipped_stale_batches == 1
        runner.keep_prev_selfplay = True
        assert runner.run_minibatch() is not None        # kept buffer trains

    def test_resign_threshold_quantile(self):
        rc = ResignThresholdCalculator(
            hist_size=1000, false_positive_target=0.1, initial_threshold=0.05,
            max_threshold=0.5,
        )
        rng = np.random.RandomState(0)
        # 200 never-resign black-win games whose black min values spread
        for _ in range(200):
            vals = [float(v) for v in rng.uniform(-0.9, 0.9, size=10)]
            rc.feed(fake_record(reward=1.0, values=vals, never_resign=True),
                    True, True)
        t0 = rc.threshold
        for _ in range(30):
            rc.update_threshold(max_delta=0.01)
        # threshold should have moved towards the 10% quantile of (1+minval)
        assert rc.threshold != t0
        assert 0.0 <= rc.threshold <= 0.5

    def test_eval_promotion_flow(self):
        opts = ControlOptions(eval_num_games=8, eval_winrate_thres=0.55)
        ev = EvalSubCtrl(opts)
        ev.set_baseline(0)
        ev.add_new_model_for_evaluation(1)
        reqs = []
        for i in range(8):
            req = MsgRequest()
            assert ev.fill_in_request(f"client{i}", req)
            assert req.vers.black_ver == 1 and req.vers.white_ver == 0
            reqs.append(req)
        swaps = [r.client_ctrl.player_swap for r in reqs]
        assert sum(swaps) == 4  # half swapped
        # candidate wins everything -> promoted
        for i, req in enumerate(reqs):
            reward = -1.0 if req.client_ctrl.player_swap else 1.0
            ev.feed(f"client{i}", fake_record(
                ver=1, white_ver=0, reward=reward, swap=req.client_ctrl.player_swap
            ))
        promoted = ev.check_promotions(lambda ident: False)
        assert promoted == 1

    def test_eval_early_loss(self):
        opts = ControlOptions(eval_num_games=8, eval_winrate_thres=0.55)
        ev = EvalSubCtrl(opts)
        ev.set_baseline(0)
        ev.add_new_model_for_evaluation(1)
        for i in range(8):
            req = MsgRequest()
            assert ev.fill_in_request(f"c{i}", req)
            # candidate loses every game
            reward = 1.0 if req.client_ctrl.player_swap else -1.0
            ev.feed(f"c{i}", fake_record(
                ver=1, white_ver=0, reward=reward, swap=req.client_ctrl.player_swap
            ))
        assert ev.check_promotions(lambda ident: False) is None
        assert ev.pending == []  # rejected

    def test_client_manager_roles_and_death(self):
        cm = ClientManager(4, max_delay_sec=0.2, selfplay_only_ratio=0.5)
        types = [cm.on_message(f"c{i}").type for i in range(4)]
        assert types.count(ClientType.EVAL_THEN_SELFPLAY) == 2
        time.sleep(0.3)
        dead = cm.sweep_dead()
        assert len(dead) == 4
        cm.on_message("c0")
        assert cm.num_alive() == 1


class TestEndToEnd:
    def test_server_client_loop(self):
        """Full socket loop: client plays cheat-mode games, ships records,
        server version-gates + fills requests; selfplay becomes sufficient."""
        opts = ControlOptions(
            expected_num_clients=1,
            selfplay_init_num=2,
            selfplay_update_num=2,
            client_max_delay_sec=60,
        )
        ropts = ReplayOptions(num_reader=2, q_min_size=1, q_max_size=50)
        server = TrainServer(opts, ropts, port=0)
        server.start()
        try:
            server.set_initial_version(0)

            size = 5
            acfg = ActorConfig(
                board_size=size, batch=2, policy_distri_cutoff=50,
                never_resign_prob=1.0, cheat_selfplay_random_result=True,
            )
            mcfg = MCTSConfig(num_rollouts=4, rollouts_per_batch=2,
                              rotation_flip=False, root_epsilon=0.25,
                              root_alpha=0.5)

            def eval_builder(params, batch_stats):
                def eval_fn(feats, to_play):
                    K = feats.shape[0]
                    return (
                        jnp.full((K, 26), -np.log(26.0)), jnp.zeros((K,))
                    )
                return eval_fn

            actor = SelfplayActor(acfg, mcfg, eval_builder, seed=3)
            client = SelfplayClient(
                opts, actor, load_params_fn=lambda ver: (None, None),
                port=server.port,
            )
            client.run(moves_per_round=10, max_rounds=30,
                       stop_fn=lambda: server.num_selfplay_games >= 3)
            assert server.num_selfplay_games >= 3
            assert server.replay.size() >= 3
            assert client.loaded_ver == 0
            assert server.selfplay.is_sufficient(initial=True)
            assert server.clients.num_alive() == 1
        finally:
            server.stop()


class TestRecordJournal:
    def test_journal_append_rotate_resume(self, tmp_path):
        """Accepted records journal to disk in rotating chunks and refill a
        sink on resume (RecordBuffer::saveCurrent, ctrl_selfplay.h:233)."""
        from elf_tpu.control.journal import RecordJournal

        d = str(tmp_path / "journal")
        j = RecordJournal(d, rotate_every=3)
        for i in range(7):
            j.append(fake_record(ver=0, reward=1.0 if i % 2 else -1.0))
        j.close()
        import os

        files = sorted(f for f in os.listdir(d) if f.endswith(".jsonl"))
        assert files == ["records-0.jsonl", "records-1.jsonl",
                         "records-2.jsonl"]

        # a fresh journal resumes numbering and replays everything
        j2 = RecordJournal(d, rotate_every=3)
        got = []
        n = j2.replay_into(got.append)
        assert n == 7 and len(got) == 7
        assert got[0].result.reward == -1.0
        j2.append(fake_record())
        j2.close()
        assert os.path.exists(os.path.join(d, "records-3.jsonl"))

    def test_server_journals_accepted_records(self, tmp_path):
        opts = ControlOptions(expected_num_clients=1, selfplay_init_num=1,
                              selfplay_update_num=1)
        ropts = ReplayOptions(num_reader=2, q_min_size=1, q_max_size=50)
        server = TrainServer(opts, ropts, port=0,
                             journal_dir=str(tmp_path / "j"))
        try:
            server.set_initial_version(0)
            from elf_tpu.selfplay.records import Records

            recs = Records(identity="c0", states={},
                           records=[fake_record(ver=0)])
            server.on_receive("c0", "content", recs.to_json_string())
            server.journal.flush()

            # restart: a new server refills its replay from the journal
            server2 = TrainServer(opts, ropts, port=0,
                                  journal_dir=str(tmp_path / "j"))
            try:
                server2.set_initial_version(0)
                assert server2.resume_from_journal() == 1
                assert server2.replay.size() == 1
            finally:
                server2.stop()
        finally:
            server.stop()
