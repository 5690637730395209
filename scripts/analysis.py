#!/usr/bin/env python
"""Analysis-mode entry point — analyze an SGF game with a checkpoint.

Counterpart of the reference's `analysis.sh` workflow
(`/root/reference/README.rst:153-166`): preload an SGF, replay to a move,
then print the AI's suggested move / value / prior at every position and
dump the full search tree per move under `--dump_record_prefix`.

Examples:
  # reference behavior: AI self-plays from the preloaded position
  python scripts/analysis.py --load ckpts/save-100.bin \
      --preload_sgf game.sgf --preload_sgf_move_to 40 \
      --dump_record_prefix tree --num_rollouts 16384 --c_puct 1.5

  # review an existing game move by move
  python scripts/analysis.py --load ckpts/save-100.bin \
      --preload_sgf game.sgf --follow_sgf --verbose
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from elf_tpu.config import GameOptions, MCTSOptions, OptionMap, OptionSpec, TrainOptions
from elf_tpu.console.analysis import AnalysisConfig, AnalysisDriver

from elf_tpu.search.mcts import MCTSConfig
from elf_tpu.training.trainer import load_checkpoint


def main(argv=None):
    spec = OptionSpec.from_dataclasses([GameOptions, MCTSOptions, TrainOptions])
    parser = spec.to_argparse()
    parser.add_argument("--load", type=str, default="",
                        help="checkpoint path (empty = random weights)")
    parser.add_argument("--follow_sgf", action="store_true",
                        help="follow the record's moves instead of self-play")
    parser.add_argument("--max_moves", type=int, default=0,
                        help="analyze at most this many moves (0 = all)")
    parser.add_argument("--top_k", type=int, default=5)
    parser.add_argument("--verbose", action="store_true",
                        help="print top-k alternatives per move")
    args = parser.parse_args(argv)
    om = OptionMap(spec, vars(args))
    g = om.get(GameOptions)
    mo = om.get(MCTSOptions)
    to = om.get(TrainOptions)

    from elf_tpu.cache import enable_compilation_cache, pin_platform_from_env
    from elf_tpu.models.registry import make_trainer

    pin_platform_from_env()
    enable_compilation_cache()
    trainer, _train_mode, feature_set = make_trainer(
        g.model, g.board_size, to, use_df_feature=g.use_df_feature
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    if args.load:
        state = load_checkpoint(args.load, template=state)
    eval_raw = trainer.make_eval_fn()

    def eval_builder(params, batch_stats):
        return lambda feats, to_play: eval_raw(params, batch_stats, feats)

    # analysis settings (README.rst:164): play puct, no noise, resign off
    mcfg = MCTSConfig(
        feature_set=feature_set,
        num_rollouts=mo.num_rollouts,
        rollouts_per_batch=mo.rollouts_per_batch,
        c_puct=mo.c_puct,
        virtual_loss=mo.virtual_loss,
        root_epsilon=0.0,
        komi=g.komi,
        rotation_flip=True,
    )
    acfg = AnalysisConfig(
        preload_sgf=g.preload_sgf,
        preload_sgf_move_to=g.preload_sgf_move_to,
        dump_record_prefix=g.dump_record_prefix,
        follow_sgf=args.follow_sgf,
        max_moves=args.max_moves,
        komi=g.komi,
        top_k=args.top_k,
        verbose=args.verbose,
    )
    driver = AnalysisDriver(eval_builder, mcfg, acfg, size=g.board_size,
                            seed=g.seed)
    driver.set_model(state.params, state.batch_stats)
    driver.run()


if __name__ == "__main__":
    main()
