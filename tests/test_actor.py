"""Self-play actor integration: lockstep games run to completion, emit
protocol Records, and reset in place (the §6 minimum end-to-end slice of
SURVEY.md's build plan, minus the network fabric)."""

import jax.numpy as jnp
import numpy as np

from elf_tpu.env.go.coords import sgf_string_to_moves
from elf_tpu.search.mcts import MCTSConfig
from elf_tpu.selfplay.actor import ActorConfig, SelfplayActor
from elf_tpu.selfplay.records import Records, dequantize_policy


def uniform_eval_builder(num_actions):
    def builder(params, batch_stats):
        def eval_fn(feats, to_play):
            K = feats.shape[0]
            return (
                jnp.full((K, num_actions), -np.log(num_actions)),
                jnp.zeros((K,)),
            )

        return eval_fn

    return builder


class TestSelfplayActor:
    def test_games_complete_and_emit_records(self):
        size = 5
        cfg = ActorConfig(
            board_size=size, batch=4, komi=7.5,
            policy_distri_cutoff=8, resign_thres=0.0, never_resign_prob=1.0,
        )
        mcfg = MCTSConfig(
            num_rollouts=8, rollouts_per_batch=4, rotation_flip=False,
            root_epsilon=0.25, root_alpha=0.5,
        )
        actor = SelfplayActor(cfg, mcfg, uniform_eval_builder(26), seed=0)
        records = []
        for _ in range(12):
            records.extend(actor.play_moves(None, None, 5))
            if len(records) >= 3:
                break
        assert len(records) >= 3, f"only {len(records)} games finished"
        for r in records:
            moves = sgf_string_to_moves(r.result.content, size)
            assert r.result.num_move == len(moves)
            assert len(r.result.values) == len(moves)
            assert r.result.reward in (-1.0, 1.0)
            # policies dequantize to distributions
            if r.result.policies:
                pi = dequantize_policy(r.result.policies[0], 26)
                assert abs(pi.sum() - 1.0) < 1e-3
        # wire round-trip
        blob = Records(identity="c0", records=records).to_json_string()
        back = Records.from_json_string(blob)
        assert len(back.records) == len(records)

    def test_chunked_search_games_are_legal(self):
        """max_batches_per_call > 0 splits a move's search into several
        device executions (prepare -> host-looped simulate -> finish);
        games must still complete legally, with and without tree reuse."""
        from elf_tpu.env.go.oracle import OracleGo

        size = 5
        for persistent in (False, True):
            cfg = ActorConfig(
                board_size=size, batch=2, komi=7.5,
                policy_distri_cutoff=6, resign_thres=0.0,
                never_resign_prob=1.0, persistent_tree=persistent,
            )
            mcfg = MCTSConfig(
                num_rollouts=12, rollouts_per_batch=2, rotation_flip=False,
                root_epsilon=0.25, root_alpha=0.5,
                max_batches_per_call=2,   # 6 batches -> 3 device calls
            )
            actor = SelfplayActor(cfg, mcfg, uniform_eval_builder(26),
                                  seed=3)
            records = []
            for _ in range(14):
                records.extend(actor.play_moves(None, None, 4))
                if records:
                    break
            assert records, f"no games finished (persistent={persistent})"
            for r in records:
                moves = sgf_string_to_moves(r.result.content, size)
                o = OracleGo(size)
                for mv in moves:
                    assert o.play(mv), (persistent, moves)

    def test_record_games_are_legal(self):
        """Replaying an emitted record through the oracle validates every
        move (cross-engine legality of self-play output)."""
        from elf_tpu.env.go.oracle import OracleGo

        size = 5
        cfg = ActorConfig(
            board_size=size, batch=2, policy_distri_cutoff=50,
            never_resign_prob=1.0,
        )
        mcfg = MCTSConfig(num_rollouts=8, rollouts_per_batch=4,
                          rotation_flip=False, root_epsilon=0.25,
                          root_alpha=0.5)
        actor = SelfplayActor(cfg, mcfg, uniform_eval_builder(26), seed=1)
        records = []
        for _ in range(14):
            records.extend(actor.play_moves(None, None, 5))
            if records:
                break
        assert records
        moves = sgf_string_to_moves(records[0].result.content, size)
        o = OracleGo(size)
        for m in moves:
            assert o.play(m), f"illegal move {m} in emitted record"


class TestPersistentTree:
    def test_persistent_tree_games_are_legal(self):
        """Tree reuse across moves must not corrupt move selection: emitted
        games replay legally through the oracle."""
        from elf_tpu.env.go.oracle import OracleGo

        size = 5
        cfg = ActorConfig(
            board_size=size, batch=2, policy_distri_cutoff=50,
            never_resign_prob=1.0, persistent_tree=True,
        )
        mcfg = MCTSConfig(num_rollouts=12, rollouts_per_batch=4,
                          rotation_flip=False, root_epsilon=0.25,
                          root_alpha=0.5)
        actor = SelfplayActor(cfg, mcfg, uniform_eval_builder(26), seed=2)
        records = []
        for _ in range(16):
            records.extend(actor.play_moves(None, None, 6))
            if len(records) >= 2:
                break
        assert len(records) >= 2
        for rec in records[:2]:
            moves = sgf_string_to_moves(rec.result.content, size)
            o = OracleGo(size)
            for m in moves:
                assert o.play(m), f"illegal move {m} with persistent tree"
        assert actor.tree is not None
        # tree stays within capacity
        import numpy as np
        assert (np.asarray(actor.tree.count) <= actor.tree.stones.shape[1]).all()


class TestGameOptions:
    def test_move_cutoff(self):
        size = 5
        cfg = ActorConfig(board_size=size, batch=2, move_cutoff=6,
                          policy_distri_cutoff=50, never_resign_prob=1.0)
        mcfg = MCTSConfig(num_rollouts=4, rollouts_per_batch=2,
                          rotation_flip=False, root_epsilon=0.25,
                          root_alpha=0.5)
        actor = SelfplayActor(cfg, mcfg, uniform_eval_builder(26), seed=4)
        records = actor.play_moves(None, None, 8)
        assert records, "cutoff games did not finish"
        for r in records:
            assert r.result.num_move <= 6

    def test_num_games_per_thread(self):
        size = 5
        cfg = ActorConfig(board_size=size, batch=2, move_cutoff=4,
                          num_games_per_thread=2, policy_distri_cutoff=50,
                          never_resign_prob=1.0)
        mcfg = MCTSConfig(num_rollouts=4, rollouts_per_batch=2,
                          rotation_flip=False, root_epsilon=0.25,
                          root_alpha=0.5)
        actor = SelfplayActor(cfg, mcfg, uniform_eval_builder(26), seed=5)
        for _ in range(10):
            actor.play_moves(None, None, 5)
            if actor.finished_all():
                break
        assert actor.finished_all()
        assert (actor.seqs == 2).all()

    def test_preload_sgf(self, tmp_path):
        size = 5
        sgf = tmp_path / "pre.sgf"
        sgf.write_text("(;GM[1]SZ[5];B[aa];W[bb])")
        cfg = ActorConfig(board_size=size, batch=2, preload_sgf=str(sgf),
                          policy_distri_cutoff=50, never_resign_prob=1.0)
        mcfg = MCTSConfig(num_rollouts=4, rollouts_per_batch=2,
                          rotation_flip=False, root_epsilon=0.25,
                          root_alpha=0.5)
        actor = SelfplayActor(cfg, mcfg, uniform_eval_builder(26), seed=6)
        import numpy as np

        stones = np.asarray(actor.state.core.stones)
        assert stones[0, 0] == 1      # B aa
        assert stones[0, 6] == 2      # W bb
        assert int(actor.state.core.ply[0]) == 2


class TestWhiteOptsVariant:
    def test_swap_selects_flipped_variant(self):
        """player_swap flips white_opts_on_black and swaps cached builds
        (game_selfplay.cc:182 swap(_ai, _ai2))."""
        from elf_tpu.selfplay.records import ClientCtrl, ModelPair, MsgRequest

        size = 5
        cfg = ActorConfig(board_size=size, batch=2, komi=7.5)
        mcfg = MCTSConfig(num_rollouts=8, rollouts_per_batch=4,
                          rotation_flip=False, white_puct=0.5)
        actor = SelfplayActor(cfg, mcfg, uniform_eval_builder(26), seed=0)
        assert not actor.mcts_cfg.white_opts_on_black

        def req(swap):
            return MsgRequest(
                vers=ModelPair(black_ver=3, white_ver=2),  # eval pair
                client_ctrl=ClientCtrl(player_swap=swap),
            )

        sentinel = object()
        actor._move_fn = sentinel
        actor._select_white_opts_variant(req(True))
        assert actor.mcts_cfg.white_opts_on_black
        assert actor._move_fn is None          # needs a fresh build
        actor._move_fn = "swapped-build"
        actor._select_white_opts_variant(req(False))
        assert not actor.mcts_cfg.white_opts_on_black
        assert actor._move_fn is sentinel      # cached variant restored
        actor._select_white_opts_variant(req(True))
        assert actor._move_fn == "swapped-build"
        # selfplay requests (white_ver == -1) never flip
        sp = MsgRequest(vers=ModelPair(black_ver=3, white_ver=-1),
                        client_ctrl=ClientCtrl(player_swap=True))
        actor._select_white_opts_variant(req(False))
        actor._select_white_opts_variant(sp)
        assert not actor.mcts_cfg.white_opts_on_black


def concentrated_eval_builder(num_actions, fav_action, value):
    """Eval whose policy mass sits on one action and whose value is fixed
    (black perspective) — makes MCTS behavior deterministic in tests."""
    def builder(params, batch_stats):
        def eval_fn(feats, to_play):
            K = feats.shape[0]
            logits = np.full((num_actions,), -20.0, np.float32)
            logits[fav_action] = 0.0
            log_pi = jnp.asarray(logits) - jnp.log(
                jnp.sum(jnp.exp(jnp.asarray(logits)))
            )
            return (
                jnp.broadcast_to(log_pi, (K, num_actions)),
                jnp.full((K,), value),
            )

        return eval_fn

    return builder


class TestFollowingPass:
    """following_pass (game_selfplay.cc:106 mcts_update_info): answer an
    opponent pass with a pass when clearly winning — TT score in the
    mover's favor AND mover-perspective search value > 0.9."""

    def _actor(self, following_pass, value=1.0):
        size = 5
        cfg = ActorConfig(
            board_size=size, batch=1, komi=5.5, policy_distri_cutoff=-1,
            resign_thres=0.0, never_resign_prob=1.0,
            following_pass=following_pass,
        )
        mcfg = MCTSConfig(num_rollouts=8, rollouts_per_batch=4,
                          rotation_flip=False, root_epsilon=0.0)
        # policy concentrated on the corner (action 0); value = `value`
        # for black everywhere
        return SelfplayActor(
            cfg, mcfg, concentrated_eval_builder(26, 0, value), seed=0
        )

    def _setup_black_winning_after_white_pass(self, actor):
        """Black owns the board center; white just passed; black to move."""
        import numpy as np
        from elf_tpu.env.go.state import step

        st = actor.state
        st, _ = step(st, np.array([12], np.int32), 5)   # black center
        st, _ = step(st, np.array([25], np.int32), 5)   # white PASS
        actor.state = st
        actor.moves[0] = [12, 25]

    def test_clearly_winning_board_follows_pass(self):
        actor = self._actor(following_pass=True, value=1.0)
        self._setup_black_winning_after_white_pass(actor)
        recs = actor.play_moves(None, None, 1)
        # black answered the pass with a pass: two passes end the game,
        # black wins on the TT count
        assert len(recs) == 1
        assert recs[0].result.reward > 0
        assert recs[0].result.content.endswith("B[])") or \
            actor_last_move_is_pass(recs[0], 5)

    def test_without_flag_plays_on(self):
        actor = self._actor(following_pass=False, value=1.0)
        self._setup_black_winning_after_white_pass(actor)
        recs = actor.play_moves(None, None, 1)
        # the concentrated policy sends black to the corner instead
        assert not recs or recs[0].result.num_move > 3

    def test_not_winning_does_not_follow(self):
        # value 0: not clearly good -> no follow even though white passed
        actor = self._actor(following_pass=True, value=0.0)
        self._setup_black_winning_after_white_pass(actor)
        recs = actor.play_moves(None, None, 1)
        assert not recs or recs[0].result.num_move > 3


def actor_last_move_is_pass(record, size):
    from elf_tpu.env.go.coords import sgf_string_to_moves

    moves = sgf_string_to_moves(record.result.content, size)
    return moves and moves[-1] == size * size
