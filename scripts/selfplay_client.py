#!/usr/bin/env python
"""Self-play client: one lockstep actor shard reporting to the server.

Counterpart of `/root/reference/scripts/elfgames/go/selfplay.py` +
`start_client.sh`: connect to the control server, load model versions from
the shared checkpoint dir on request, play MCTS self-play games, ship
records.

Example (prod-shaped, start_client.sh:11):
  python scripts/selfplay_client.py --ckpt_dir /ckpts \
      --server_addr 10.0.0.1 --port 5556 --num_games 32 \
      --num_rollouts 1600 --root_epsilon 0.25
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from elf_tpu.config import (
    ControlOptions,
    GameOptions,
    MCTSOptions,
    OptionMap,
    OptionSpec,
    TrainOptions,
)
from elf_tpu.logging_utils import configure, get_indexed_logger

from elf_tpu.search.mcts import MCTSConfig
from elf_tpu.selfplay.actor import ActorConfig, SelfplayActor
from elf_tpu.control.client import SelfplayClient
from elf_tpu.training.trainer import load_checkpoint


def main(argv=None):
    spec = OptionSpec.from_dataclasses(
        [GameOptions, MCTSOptions, TrainOptions, ControlOptions]
    )
    parser = spec.to_argparse()
    parser.add_argument("--ckpt_dir", type=str, required=True)
    parser.add_argument("--moves_per_round", type=int, default=16)
    parser.add_argument("--max_rounds", type=int, default=0,
                        help="stop after this many rounds (0 = forever)")
    parser.add_argument("--max_games", type=int, default=0,
                        help="stop after completing this many games "
                             "(work-based; 0 = forever)")
    parser.add_argument("--wait_server_ready", type=int, default=1,
                        help="block until the server reports ready "
                             "before starting the play loop")
    parser.add_argument("--loglevel", type=str, default="info")
    args = parser.parse_args(argv)
    om = OptionMap(spec, vars(args))
    g = om.get(GameOptions)
    mo = om.get(MCTSOptions)
    to = om.get(TrainOptions)
    co = om.get(ControlOptions)

    from elf_tpu.cache import enable_compilation_cache, pin_platform_from_env

    pin_platform_from_env()
    enable_compilation_cache()
    configure(args.loglevel)
    logger = get_indexed_logger("scripts.selfplay_client-")

    from elf_tpu.models.registry import make_trainer

    trainer, _train_mode, feature_set = make_trainer(
        g.model, g.board_size, to, use_df_feature=g.use_df_feature
    )
    template = trainer.init_state(__import__("jax").random.PRNGKey(0))
    eval_raw = trainer.make_eval_fn()

    def eval_builder(params, batch_stats):
        return lambda feats, to_play: eval_raw(params, batch_stats, feats)

    acfg = ActorConfig(
        board_size=g.board_size,
        batch=g.num_games,
        komi=g.komi,
        policy_distri_cutoff=g.policy_distri_cutoff,
        resign_thres=co.resign_thres,
        never_resign_prob=co.never_resign_prob,
        cheat_selfplay_random_result=g.cheat_selfplay_random_result,
        dump_record_prefix=g.dump_record_prefix,
        handicap=g.handicap_level,
        persistent_tree=mo.persistent_tree,
        move_cutoff=g.move_cutoff,
        num_games_per_thread=g.num_games_per_thread,
        preload_sgf=g.preload_sgf,
        preload_sgf_move_to=g.preload_sgf_move_to,
        policy_distri_training_for_all=g.policy_distri_training_for_all,
        following_pass=g.following_pass,
    )
    mcfg = MCTSConfig(
        feature_set=feature_set,
        num_rollouts=mo.num_rollouts,
        rollouts_per_batch=mo.rollouts_per_batch,
        c_puct=mo.c_puct,
        virtual_loss=mo.virtual_loss,
        root_epsilon=mo.root_epsilon,
        root_alpha=mo.root_alpha,
        komi=g.komi,
        ply_pass_enabled=g.ply_pass_enabled,
        white_puct=g.white_puct,
        white_num_rollouts=g.white_num_rollouts,
        use_prior=mo.use_prior,
        unexplored_q_zero=mo.unexplored_q_zero,
        root_unexplored_q_zero=mo.root_unexplored_q_zero,
        max_nodes=mo.max_nodes,
    )
    actor = SelfplayActor(acfg, mcfg, eval_builder, seed=g.seed)

    # eval-capable: a second actor plays candidate-vs-baseline jobs with
    # noise-free MCTS (the server strips noise in the shipped mcts_opt)
    import dataclasses as _dc

    from elf_tpu.selfplay.actor import make_pair_eval_builder

    eval_actor = SelfplayActor(
        _dc.replace(acfg, never_resign_prob=1.0, resign_thres=0.0),
        _dc.replace(mcfg, root_epsilon=0.0, root_alpha=0.0),
        make_pair_eval_builder(eval_raw),
        seed=g.seed + 1,
    )

    def load_params(ver: int):
        path = os.path.join(args.ckpt_dir, f"save-{ver}.bin")
        state = load_checkpoint(path, template=template)
        return state.params, state.batch_stats

    client = SelfplayClient(
        co, actor, load_params, port=co.port, eval_actor=eval_actor,
        cheat_eval_new_model_wins_half=g.cheat_eval_new_model_wins_half,
    )
    logger.info(
        "client %s -> %s:%d (B=%d, %d rollouts)",
        client.identity, co.server_addr, co.port, g.num_games, mo.num_rollouts,
    )
    if args.wait_server_ready:
        if not client.wait_server_ready():
            logger.error("server never became ready; exiting")
            sys.exit(2)
        logger.info("server ready")
    client.run(moves_per_round=args.moves_per_round,
               max_rounds=args.max_rounds if args.max_rounds > 0 else None,
               max_games=args.max_games if args.max_games > 0 else None)


if __name__ == "__main__":
    main()
