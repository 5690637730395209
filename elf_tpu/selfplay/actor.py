"""Vectorized self-play actor: B lockstep games of MCTS self-play.

TPU-native replacement for the reference per-thread game loop
(`/root/reference/src_cpp/elfgames/go/common/game_selfplay.cc`):
thousands of C++ game threads + dynamic batching collapse into one jitted
`move_fn` over `[B]` boards — the batch IS the array (SURVEY.md §2.4).

Per move (game_selfplay.cc::act):
 - MCTS with Dirichlet root noise (selfplay) / none (eval);
 - diverse move sampling from the normalized visit distribution while
   ply <= policy_distri_cutoff, argmax after (mcts_make_diverse_move,
   game_selfplay.cc:80);
 - predicted value tracked per move; resign when the mover-perspective
   value < -1 + resign_thres unless this game drew its per-game
   never-resign flag (game_utils.h:15 ResignCheck, go_state_ext.h:207);
 - env step + termination (two-pass / max-move / superko).

Game lifecycle is hosted: finished boards emit protocol Records (moves as
compact SGF string + 8-bit quantized MCTS policies + per-move values,
go_state_ext.h:128 dumpRecord) and are reset in place (the vectorized
equivalent of `restart`).  Cheat modes for control-plane integration tests
(`--cheat_selfplay_random_result`, game.py:243) replace the real outcome.

Eval mode (candidate-vs-baseline with color swap, ctrl_eval.h semantics):
both param sets are evaluated and per-board selection picks the mover's
model — lockstep-friendly at 2x NN cost.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from elf_tpu.env.go import engine, state as gostate
from elf_tpu.env.go.engine import BLACK, WHITE
from elf_tpu.env.go.state import GoState, init_state, reset_where, step
from elf_tpu.search.mcts import MCTSConfig, run_mcts
from elf_tpu.selfplay.records import MsgRequest, Record, make_record


@dataclasses.dataclass(frozen=True)
class ActorConfig:
    board_size: int = 19
    batch: int = 64
    komi: float = 7.5
    policy_distri_cutoff: int = 30
    resign_thres: float = 0.05
    never_resign_prob: float = 0.1
    cheat_selfplay_random_result: bool = False
    dump_record_prefix: str = ""   # write an SGF per finished game
    handicap: int = 0
    # reuse the search tree across moves (TSOptions persistent_tree /
    # treeAdvance): subtree stats carry over; capacity 2x rollouts
    persistent_tree: bool = False
    # end games at this ply with a TT count (go_game_specific.h:61)
    move_cutoff: int = -1
    # stop a board slot after this many games (go_game_specific.h:27)
    num_games_per_thread: int = -1
    # start games from this SGF prefix (go_game_specific.h:76-77);
    # emitted records contain only the moves played after the preload
    preload_sgf: str = ""
    preload_sgf_move_to: int = -1
    # store the full MCTS visit distribution for EVERY ply, not just the
    # diverse-sampling plies below the cutoff (go_game_specific.h:65;
    # gate at game_selfplay.cc:89).  Off (the reference default), later
    # plies train on the one-hot of the played move (game_feature.h:107
    # extractMCTSPi fallback).
    policy_distri_training_for_all: bool = False
    # answer an opponent pass with a pass when clearly winning — TT score
    # in our favor AND |search value| > 0.9 (mcts_update_info
    # following_pass, game_selfplay.cc:106; there it is additionally
    # gated on a human opponent being present, so the reference default
    # behavior — flag off — is identical)
    following_pass: bool = False


def make_pair_eval_builder(eval_raw):
    """Two-model evaluator for eval games (candidate vs baseline,
    ctrl_eval.h): params/batch_stats are (black_model, white_model) pairs;
    each MCTS leaf is routed to the mover's net.  Lockstep-friendly at 2x
    NN cost (the reference dedicates whole client processes instead)."""
    from elf_tpu.env.go.engine import BLACK as _BLACK

    def builder(params, batch_stats):
        p_black, p_white = params
        b_black, b_white = batch_stats

        def eval_fn(feats, to_play):
            lp_b, v_b = eval_raw(p_black, b_black, feats)
            lp_w, v_w = eval_raw(p_white, b_white, feats)
            is_black = to_play == _BLACK
            return (
                jnp.where(is_black[:, None], lp_b, lp_w),
                jnp.where(is_black, v_b, v_w),
            )

        return eval_fn

    return builder


def _maybe_follow_pass(cfg: "ActorConfig", state: GoState, action, v, size: int):
    """following_pass (game_selfplay.cc:106 mcts_update_info): if the
    opponent just passed and we are clearly good — TT score favors the
    mover AND the mover-perspective search value > 0.9 — answer with a
    pass (ends the game instead of grinding out a clearly-won board)."""
    if not cfg.following_pass:
        return action
    n2 = size * size
    pre_score = (
        engine.score_tromp_taylor(state.core, size).astype(jnp.float32)
        - cfg.komi
    )
    is_black = state.core.to_play == BLACK
    we_good = jnp.where(
        is_black, (pre_score > 0) & (v > 0.9), (pre_score < 0) & (v < -0.9)
    )
    last_pass = state.core.last_move == n2
    return jnp.where(
        we_good & last_pass & ~state.terminated, jnp.int32(n2), action
    )


class MoveOutput(NamedTuple):
    action: jax.Array           # i32 [B]
    mcts_policy: jax.Array      # f32 [B, A]
    predicted_value: jax.Array  # f32 [B] black perspective (root search value)
    resign: jax.Array           # bool [B] mover resigns before this move
    terminated: jax.Array       # bool [B] game over after this move
    final_score: jax.Array      # f32 [B] evaluate() of the post-move state


class SelfplayActor:
    def __init__(
        self,
        cfg: ActorConfig,
        mcts_cfg: MCTSConfig,
        eval_fn_builder: Callable[..., Any],
        seed: int = 0,
        mesh: Optional[Any] = None,
    ):
        """eval_fn_builder(params, batch_stats) -> eval_fn(features).

        For eval games pass `eval_fn_builder2` via `set_eval_pair`.

        mesh: optional `jax.sharding.Mesh` with a 'dp' axis — the move step
        then runs GSPMD-sharded: boards/trees split on dp, params
        replicated (the pod-slice self-play DP shard of SURVEY §2.4; the
        reference scales this with 2000 independent 1-GPU client
        processes, README.rst:134).  cfg.batch must divide by mesh 'dp'.

        With a 'tp' axis of size > 1, set `params_sharding` to a pytree of
        NamedSharding (elf_tpu.parallel.mesh.param_shardings) and pass
        params device_put to those shardings: leaf NN evals then run
        tensor-parallel over tp while boards stay dp-sharded."""
        self.cfg = cfg
        self.mesh = mesh
        # pytree of NamedSharding for the params argument (None = fully
        # replicated); batch_stats are always replicated
        self.params_sharding = None
        self.mcts_cfg = dataclasses.replace(mcts_cfg, komi=cfg.komi)
        self.eval_fn_builder = eval_fn_builder
        self.size = cfg.board_size
        self.n2 = self.size * self.size
        self.A = self.n2 + 1
        self.rng = np.random.RandomState(seed)
        self.key = jax.random.PRNGKey(seed)
        self._move_fn = None
        self._reset_fn = None
        self._chunked_fns = None
        # jitted-fn variants keyed by white_opts_on_black (player_swap
        # moves the white-options AI onto black, game_selfplay.cc:182)
        self._fn_variants = {}

        B = cfg.batch
        self._fresh_state = self._make_fresh_state(B)
        # the live state is donated into move_fn each step — keep the reset
        # template's buffers separate
        self.state = jax.tree.map(jnp.copy, self._fresh_state)
        # start-position wire fields: emitted records replay from THIS
        # position, not an empty board (handicap: white moves first,
        # go_state.cc HandicapTable; preload: whatever the SGF left)
        stones0 = np.asarray(self._fresh_state.core.stones)[0]
        self._first_player = int(np.asarray(self._fresh_state.core.to_play)[0])
        self._setup_black = np.nonzero(stones0 == 1)[0].tolist()
        self._setup_white = np.nonzero(stones0 == 2)[0].tolist()
        # dynamic per-request controls (ClientCtrl): mutable at runtime
        self.resign_thres = cfg.resign_thres
        self.never_resign_prob = cfg.never_resign_prob
        self.never_resign = self.rng.rand(B) < cfg.never_resign_prob
        self.moves: List[List[int]] = [[] for _ in range(B)]
        self.policies: List[List[np.ndarray]] = [[] for _ in range(B)]
        self.values: List[List[float]] = [[] for _ in range(B)]
        self.seqs = np.zeros(B, np.int64)
        self.completed_games = 0
        # optional reward override (cheat_eval_new_model_wins_half,
        # game_selfplay.cc:121 finish_game cheat paths)
        self.reward_override_fn = None
        # model versions used per board (async mode, record.h using_models)
        self.using_models: List[List[int]] = [[] for _ in range(B)]
        self._dump_count = 0
        # persistent search tree (device arrays), created lazily
        self.tree = None
        # ClientCtrl.num_game_thread_used (record.h:31): boards >= this
        # index are frozen (the reference marks surplus game threads as
        # wait, dispatcher_callback.h:27); None = all boards active
        self.active_boards: Optional[int] = None

    def _make_fresh_state(self, B: int):
        """Initial game state: handicap and/or SGF-preload applied."""
        cfg = self.cfg
        state = init_state(B, self.size)
        if cfg.handicap:
            from elf_tpu.env.go.state import apply_handicap

            state = apply_handicap(state, cfg.handicap, self.size)
        if cfg.preload_sgf:
            from elf_tpu.sgf import parse_sgf

            with open(cfg.preload_sgf) as f:
                game = parse_sgf(f.read())
            moves = [m for _, m in game.main_moves()]
            if cfg.preload_sgf_move_to >= 0:
                moves = moves[: cfg.preload_sgf_move_to]
            for mv in moves:
                state, _ = step(state, np.full((B,), mv, np.int32), self.size)
        return state

    def set_active_boards(self, n: Optional[int]) -> None:
        """Freeze board slots >= n (ClientCtrl.num_game_thread_used)."""
        self.active_boards = (
            n if n is not None and 0 <= n < self.cfg.batch else None
        )

    def apply_ts_options(self, ts) -> bool:
        """Apply server-sent MCTS options (records.TSOptions inside
        ModelPair, model_pair.h:10): rollout budget, noise, puct, pick
        method, persistent tree.  Rebuilds the jitted move fn only when
        something actually changed.  Returns True on rebuild."""
        new_mcfg = dataclasses.replace(
            self.mcts_cfg, komi=self.cfg.komi, **ts.as_mcts_kwargs()
        )
        new_cfg = dataclasses.replace(
            self.cfg, persistent_tree=bool(ts.persistent_tree)
        )
        if new_mcfg == self.mcts_cfg and new_cfg == self.cfg:
            return False
        self.mcts_cfg = new_mcfg
        self.cfg = new_cfg
        self._move_fn = None
        self._chunked_fns = None
        self._fn_variants = {}
        self.tree = None
        return True

    def finished_all(self) -> bool:
        """True when every slot reached num_games_per_thread
        (GoStateExt::finished, go_state_ext.h:230)."""
        n = self.cfg.num_games_per_thread
        return n > 0 and bool((self.seqs >= n).all())

    # ------------------------------------------------------------------ jit

    def _build_move_fn(self):
        size = self.size
        cfg = self.cfg
        mcfg = self.mcts_cfg

        def policy_only(state: GoState, eval_fn, key):
            """actPolicyOnly (mcts.h:59 region): raw net policy, no search."""
            from elf_tpu.env.go import features as gofeat
            from elf_tpu.search.mcts import MCTSResult

            B = state.core.stones.shape[0]
            codes = (
                jax.random.randint(key, (B,), 0, 8)
                if mcfg.rotation_flip
                else jnp.zeros((B,), jnp.int32)
            )
            if mcfg.feature_set == "df":
                feats = gofeat.extract_df(state, codes, size)
            else:
                feats = gofeat.extract_agz(state, codes, size)
            log_pi, value = eval_fn(feats, state.core.to_play)
            pi = gofeat.inv_transform_policy(jnp.exp(log_pi), codes, size)
            lm = gostate.legal_moves(state, size)
            pi = jnp.where(lm, pi, 0.0)
            pi = pi / jnp.maximum(pi.sum(axis=1, keepdims=True), 1e-10)
            best = jnp.argmax(pi, axis=1).astype(jnp.int32)
            return MCTSResult(
                mcts_policy=pi, best_action=best,
                root_value=value, root_q=value,
            )

        def move_fn(state: GoState, params, batch_stats, key, never_resign,
                    resign_thres, tree_in=None):
            eval_fn = self.eval_fn_builder(params, batch_stats)
            k_mcts, k_sample = jax.random.split(key)
            search_tree = None
            if mcfg.num_rollouts <= 0:
                res = policy_only(state, eval_fn, k_mcts)
            else:
                res, search_tree = run_mcts(
                    state.core, state.stone_hist, state.hist_len,
                    eval_fn, k_mcts, mcfg, size,
                    init_tree=tree_in if cfg.persistent_tree else None,
                    game_hash_hist=(state.hash_hist_lo, state.hash_hist_hi,
                                    state.nhash),
                    root_last_placed=(state.last_placed
                                      if mcfg.feature_set == "df" else None),
                )
            # diverse move below the cutoff ply (game_selfplay.cc:80)
            diverse = state.core.ply <= cfg.policy_distri_cutoff
            logits = jnp.where(res.mcts_policy > 0, jnp.log(
                jnp.maximum(res.mcts_policy, 1e-10)), -1e9)
            sampled = jax.random.categorical(k_sample, logits, axis=1)
            action = jnp.where(diverse, sampled, res.best_action).astype(jnp.int32)
            action = _maybe_follow_pass(cfg, state, action, res.root_q, size)

            # resign check (ResignCheck.check: mover value < -1 + thres)
            v = res.root_q
            mover_v = jnp.where(state.core.to_play == BLACK, v, -v)
            resign = (
                (mover_v < -1.0 + resign_thres)
                & ~never_resign
                & ~state.terminated
            )

            new_state, _info = step(state, action, size)
            # resigning boards do not play the move
            new_state = gostate._tree_where(resign, state, new_state)
            final_score = gostate.evaluate(new_state, size, cfg.komi)
            out = MoveOutput(
                action=action,
                mcts_policy=res.mcts_policy,
                predicted_value=v,
                resign=resign,
                terminated=new_state.terminated,
                final_score=final_score,
            )
            if not cfg.persistent_tree:
                return new_state, out
            from elf_tpu.search.mcts import advance_tree

            tree_out = advance_tree(
                search_tree, action, new_state.core, size,
                tree_in.stones.shape[1],
            )
            return new_state, tree_out, out

        # Donate the game state (and the persistent tree — gigabytes at
        # production shapes) so XLA updates them in place instead of
        # copying: state/tree_in have identical layouts to their outputs.
        donate = (0, 6) if cfg.persistent_tree else (0,)
        if self.mesh is None:
            return jax.jit(move_fn, donate_argnums=donate)

        # GSPMD self-play: boards/trees sharded on dp, params replicated.
        # Pytree-prefix shardings: one NamedSharding per argument applies
        # to every leaf of that argument.
        from jax.sharding import NamedSharding, PartitionSpec as P

        batched = NamedSharding(self.mesh, P("dp"))
        repl = NamedSharding(self.mesh, P())
        pr = self.params_sharding if self.params_sharding is not None else repl
        if cfg.persistent_tree:
            in_sh = (batched, pr, repl, repl, batched, repl, batched)
            out_sh = (batched, batched, batched)
        else:
            in_sh = (batched, pr, repl, repl, batched, repl)
            out_sh = (batched, batched)
        return jax.jit(
            move_fn, in_shardings=in_sh, out_shardings=out_sh,
            donate_argnums=donate,
        )

    # -- host-chunked search (production rollout budgets) -------------------

    def _shardings(self):
        if self.mesh is None:
            return None, None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return (NamedSharding(self.mesh, P("dp")),
                NamedSharding(self.mesh, P()))

    def _build_chunked_fns(self):
        """Three jitted phases so no single device execution exceeds
        ~max_batches_per_call NN sweeps (TPU runtimes kill executions that
        run for minutes as hung workers): prepare (root eval + noise),
        simulate (a chunk of sim batches, tree donated), finish
        (result + diverse move + resign + env step [+ advance])."""
        from elf_tpu.search.mcts import (
            mcts_finalize,
            mcts_root_prepare,
            mcts_simulate,
        )

        size = self.size
        cfg = self.cfg
        mcfg = self.mcts_cfg
        m = max(1, mcfg.rollouts_per_batch)
        total_batches = max(
            1, max(mcfg.num_rollouts, mcfg.white_num_rollouts) // m
        )
        chunk = min(mcfg.max_batches_per_call, total_batches)
        n_full, rem = divmod(total_batches, chunk)

        def prepare(state: GoState, params, batch_stats, key, tree_in=None):
            eval_fn = self.eval_fn_builder(params, batch_stats)
            return mcts_root_prepare(
                state.core, state.stone_hist, state.hist_len, eval_fn, key,
                mcfg, size,
                init_tree=tree_in if cfg.persistent_tree else None,
                root_last_placed=(state.last_placed
                                  if mcfg.feature_set == "df" else None),
            )

        def make_sim(n_batches):
            def simulate(tree, state: GoState, params, batch_stats, key,
                         offset):
                eval_fn = self.eval_fn_builder(params, batch_stats)
                return mcts_simulate(
                    tree, state.stone_hist, state.hist_len, eval_fn, key,
                    mcfg, size, n_batches,
                    game_hash_hist=(state.hash_hist_lo, state.hash_hist_hi,
                                    state.nhash),
                    # cumulative sim-batch offset: per-player rollout
                    # budgets (white_num_rollouts) count across chunks
                    batch_offset=offset,
                    root_last_placed=(state.last_placed
                                      if mcfg.feature_set == "df" else None),
                )

            return simulate

        def finish(state: GoState, tree, key, never_resign, resign_thres):
            k_pick, k_sample = jax.random.split(key)
            res = mcts_finalize(tree, k_pick, mcfg)
            diverse = state.core.ply <= cfg.policy_distri_cutoff
            logits = jnp.where(res.mcts_policy > 0, jnp.log(
                jnp.maximum(res.mcts_policy, 1e-10)), -1e9)
            sampled = jax.random.categorical(k_sample, logits, axis=1)
            action = jnp.where(diverse, sampled,
                               res.best_action).astype(jnp.int32)
            action = _maybe_follow_pass(cfg, state, action, res.root_q, size)
            v = res.root_q
            mover_v = jnp.where(state.core.to_play == BLACK, v, -v)
            resign = (
                (mover_v < -1.0 + resign_thres)
                & ~never_resign
                & ~state.terminated
            )
            new_state, _info = step(state, action, size)
            new_state = gostate._tree_where(resign, state, new_state)
            final_score = gostate.evaluate(new_state, size, cfg.komi)
            out = MoveOutput(
                action=action,
                mcts_policy=res.mcts_policy,
                predicted_value=v,
                resign=resign,
                terminated=new_state.terminated,
                final_score=final_score,
            )
            if not cfg.persistent_tree:
                return new_state, out
            from elf_tpu.search.mcts import advance_tree

            tree_out = advance_tree(
                tree, action, new_state.core, size, tree.stones.shape[1],
            )
            return new_state, tree_out, out

        batched, repl = self._shardings()

        def jit_with(fn, donate, in_sh, out_sh):
            if self.mesh is None:
                return jax.jit(fn, donate_argnums=donate)
            return jax.jit(fn, donate_argnums=donate,
                           in_shardings=in_sh, out_shardings=out_sh)

        pr = (self.params_sharding if self.params_sharding is not None
              else repl)
        prep_in = ((batched, pr, repl, repl, batched)
                   if cfg.persistent_tree
                   else (batched, pr, repl, repl))
        fns = {
            "prepare": jit_with(
                prepare,
                donate=(4,) if cfg.persistent_tree else (),
                in_sh=prep_in, out_sh=batched,
            ),
            "simulate": jit_with(
                make_sim(chunk), donate=(0,),
                in_sh=(batched, batched, pr, repl, repl, repl),
                out_sh=batched,
            ),
            "chunk": chunk,
            # the tree is donated into finish only when finish RETURNS a
            # tree (persistent path, via advance_tree): donating it on
            # the transient path has no matching output, so XLA cannot
            # alias anything and jax warns "donated buffers were not
            # usable" — a no-op donation that read as a hot-loop copy in
            # benchmark logs.  (The per-simulate-chunk donation, where
            # the big buffers actually cycle, aliases cleanly.)
            "finish": jit_with(
                finish,
                donate=(0, 1) if cfg.persistent_tree else (0,),
                in_sh=(batched, batched, repl, batched, repl),
                out_sh=((batched, batched, batched)
                        if cfg.persistent_tree else (batched, batched)),
            ),
            "n_full": n_full,
        }
        if rem:
            fns["simulate_rem"] = jit_with(
                make_sim(rem), donate=(0,),
                in_sh=(batched, batched, repl, repl, repl, repl),
                out_sh=batched,
            )
        return fns

    def _chunked_move(self, params, batch_stats, k, nr, resign_thres):
        """One move via prepare -> host-looped simulate -> finish."""
        if self._chunked_fns is None:
            self._chunked_fns = self._build_chunked_fns()
        fns = self._chunked_fns
        cfg = self.cfg
        k_prep, k_sim, k_fin = jax.random.split(k, 3)
        if cfg.persistent_tree:
            if self.tree is None:
                from elf_tpu.search.mcts import fresh_tree

                capacity = self.mcts_cfg.max_nodes or (
                    2 * max(self.mcts_cfg.num_rollouts,
                            self.mcts_cfg.white_num_rollouts) + 2
                )
                self.tree = fresh_tree(cfg.batch, self.size,
                                       max(capacity, 3), self.state.core)
            tree = fns["prepare"](self.state, params, batch_stats, k_prep,
                                  self.tree)
            self.tree = None  # donated
        else:
            tree = fns["prepare"](self.state, params, batch_stats, k_prep)
        for i in range(fns["n_full"]):
            tree = fns["simulate"](
                tree, self.state, params, batch_stats,
                jax.random.fold_in(k_sim, i),
                jnp.int32(i * fns["chunk"]),
            )
        if "simulate_rem" in fns:
            tree = fns["simulate_rem"](
                tree, self.state, params, batch_stats,
                jax.random.fold_in(k_sim, -1),
                jnp.int32(fns["n_full"] * fns["chunk"]),
            )
        outs = fns["finish"](self.state, tree, k_fin, nr, resign_thres)
        if cfg.persistent_tree:
            new_state, self.tree, out = outs
            return new_state, out
        new_state, out = outs
        return new_state, out

    # ----------------------------------------------------------------- host

    def _select_white_opts_variant(self, request) -> None:
        """Per-player options follow the white_ver MODEL, and player_swap
        moves that model onto black (game_selfplay.cc:182 swap(_ai, _ai2))
        — flip the config's white_opts_on_black to match, swapping the
        cached jitted builds in/out."""
        mcfg = self.mcts_cfg
        if mcfg.white_puct <= 0 and mcfg.white_num_rollouts <= 0:
            return
        swap = bool(
            request is not None
            and not request.vers.is_selfplay()
            and request.client_ctrl.player_swap
        )
        if mcfg.white_opts_on_black == swap:
            return
        self._fn_variants[mcfg.white_opts_on_black] = (
            self._move_fn, self._chunked_fns
        )
        self.mcts_cfg = dataclasses.replace(mcfg, white_opts_on_black=swap)
        self._move_fn, self._chunked_fns = self._fn_variants.get(
            swap, (None, None)
        )

    def play_moves(self, params, batch_stats, n_moves: int,
                   request: Optional[MsgRequest] = None) -> List[Record]:
        """Advance all B games by n_moves plies; returns Records of games
        that finished (each finished board is reset in place)."""
        self._select_white_opts_variant(request)
        chunked = (
            self.mcts_cfg.max_batches_per_call > 0
            and self.mcts_cfg.num_rollouts > 0
        )
        if self._move_fn is None and not chunked:
            self._move_fn = self._build_move_fn()
        cfg = self.cfg
        B = cfg.batch
        records: List[Record] = []
        for _ in range(n_moves):
            self.key, k = jax.random.split(self.key)
            nr = jnp.asarray(self.never_resign)
            if self.active_boards is not None:
                inact = np.zeros(B, bool)
                inact[self.active_boards:] = True
                self.state = self.state._replace(
                    terminated=self.state.terminated | jnp.asarray(inact)
                )
            # host reads of the pre-move state MUST happen before the call:
            # its buffers are donated into move_fn
            was_terminated = np.asarray(self.state.terminated)
            to_play_before = np.asarray(self.state.core.to_play)
            ply_before = np.asarray(self.state.core.ply)
            use_chunked = (
                self.mcts_cfg.max_batches_per_call > 0
                and self.mcts_cfg.num_rollouts > 0
            )
            if use_chunked:
                new_state, out = self._chunked_move(
                    params, batch_stats, k, nr,
                    jnp.float32(self.resign_thres),
                )
            elif cfg.persistent_tree:
                if self.tree is None:
                    from elf_tpu.search.mcts import fresh_tree

                    capacity = self.mcts_cfg.max_nodes or (
                        2 * max(self.mcts_cfg.num_rollouts,
                                self.mcts_cfg.white_num_rollouts) + 2
                    )
                    self.tree = fresh_tree(B, self.size, max(capacity, 3),
                                           self.state.core)
                new_state, new_tree, out = self._move_fn(
                    self.state, params, batch_stats, k, nr,
                    jnp.float32(self.resign_thres), self.tree,
                )
                self.tree = new_tree
            else:
                new_state, out = self._move_fn(
                    self.state, params, batch_stats, k, nr,
                    jnp.float32(self.resign_thres),
                )

            action = np.asarray(out.action)
            policy = np.asarray(out.mcts_policy)
            value = np.asarray(out.predicted_value)
            resign = np.asarray(out.resign)
            terminated = np.asarray(out.terminated)
            score = np.asarray(out.final_score)

            finished = np.zeros(B, bool)
            for b in range(B):
                if was_terminated[b]:
                    # frozen slot (game quota reached) or a stale terminal:
                    # nothing to play or emit
                    continue
                if resign[b]:
                    # mover resigns: reward = resigner loses
                    to_play = int(to_play_before[b])
                    reward = -1.0 if to_play == BLACK else 1.0
                    records.append(self._emit(b, reward, request))
                    finished[b] = True
                    continue
                self.moves[b].append(int(action[b]))
                # visit distribution stored only for diverse plies unless
                # policy_distri_training_for_all (game_selfplay.cc:89);
                # None quantizes to an empty CoordRecord -> the training
                # pipeline falls back to the played move's one-hot
                store_pi = (
                    cfg.policy_distri_training_for_all
                    or int(ply_before[b]) <= cfg.policy_distri_cutoff
                )
                self.policies[b].append(policy[b] if store_pi else None)
                self.values[b].append(float(value[b]))
                hit_cutoff = (
                    cfg.move_cutoff > 0
                    and len(self.moves[b]) >= cfg.move_cutoff
                )
                if terminated[b] or hit_cutoff:
                    reward = float(np.sign(score[b])) or 1.0
                    if cfg.cheat_selfplay_random_result:
                        reward = float(self.rng.choice([-1.0, 1.0]))
                    if self.reward_override_fn is not None:
                        reward = float(self.reward_override_fn(b))
                    records.append(self._emit(b, reward, request))
                    finished[b] = True

            self.state = new_state
            if finished.any():
                # slots that reached their game quota stay frozen
                # (GoStateExt::finished); the rest restart from the fresh
                # (handicap/preload-applied) template
                reset = finished.copy()
                if cfg.num_games_per_thread > 0:
                    for b in np.nonzero(finished)[0]:
                        if self.seqs[b] + 1 >= cfg.num_games_per_thread:
                            reset[b] = False
                frozen = finished & ~reset
                if frozen.any():
                    self.state = self.state._replace(
                        terminated=self.state.terminated | jnp.asarray(frozen)
                    )
                mask = jnp.asarray(reset)
                from elf_tpu.env.go.state import _tree_where

                self.state = _tree_where(mask, self._fresh_state, self.state)
                if cfg.persistent_tree and self.tree is not None:
                    from elf_tpu.search.mcts import reset_tree_where

                    self.tree = reset_tree_where(self.tree, mask,
                                                 self.state.core)
                for b in np.nonzero(finished)[0]:
                    self.moves[b] = []
                    self.policies[b] = []
                    self.values[b] = []
                    self.using_models[b] = []
                    self.never_resign = self.never_resign.copy()
                    self.never_resign[b] = (
                        self.rng.rand() < self.never_resign_prob
                    )
                    self.seqs[b] += 1
                self.completed_games += int(finished.sum())
        return records

    def reset_all(self) -> None:
        self.tree = None
        self._reset_all_impl()

    def _reset_all_impl(self) -> None:
        """Restart every game (sync-mode model change: the reference
        ThreadedDispatcher restart path, game_selfplay.cc:222 OnReceive)."""
        B = self.cfg.batch
        self.state = init_state(B, self.size)
        if self.cfg.handicap:
            from elf_tpu.env.go.state import apply_handicap

            self.state = apply_handicap(self.state, self.cfg.handicap, self.size)
        for b in range(B):
            if self.moves[b]:
                self.seqs[b] += 1
            self.moves[b] = []
            self.policies[b] = []
            self.values[b] = []
            self.using_models[b] = []
            self.never_resign[b] = self.rng.rand() < self.never_resign_prob

    def note_model_version(self, ver: int) -> None:
        """Track the model version for in-flight games (async mode:
        setAsync -> addCurrentModel, game_selfplay.cc:151)."""
        for b in range(self.cfg.batch):
            if not self.using_models[b] or self.using_models[b][-1] != ver:
                self.using_models[b].append(ver)

    def _maybe_dump_sgf(self, b: int, reward: float) -> None:
        if not self.cfg.dump_record_prefix:
            return
        from elf_tpu.sgf.sgf import game_from_moves, serialize_sgf

        result = f"B+{abs(reward)}" if reward > 0 else f"W+{abs(reward)}"
        game = game_from_moves(self.moves[b], self.size, komi=self.cfg.komi,
                               result=result)
        self._dump_count += 1
        path = (
            f"{self.cfg.dump_record_prefix}-{b}-{self.seqs[b]}-"
            f"{self._dump_count}.sgf"
        )
        try:
            with open(path, "w") as f:
                f.write(serialize_sgf(game))
        except OSError:
            pass

    def _emit(self, b: int, reward: float, request: Optional[MsgRequest]) -> Record:
        self._maybe_dump_sgf(b, reward)
        return make_record(
            self.moves[b],
            reward,
            self.policies[b],
            self.values[b],
            self.size,
            request=request,
            thread_id=b,
            seq=int(self.seqs[b]),
            never_resign=bool(self.never_resign[b]),
            using_models=list(self.using_models[b]),
            first_player=self._first_player,
            setup_black=self._setup_black,
            setup_white=self._setup_white,
        )
