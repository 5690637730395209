#!/usr/bin/env python
"""GTP console entry point — play against or analyze with a checkpoint.

Counterpart of `/root/reference/scripts/elfgames/go/df_console.py` (and the
`gtp.sh` launcher): reads GTP on stdin, answers on stdout.

Example:
  python scripts/gtp_console.py --load /ckpts/save-100.bin \
      --num_block 20 --dim 256 --num_rollouts 16384
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from elf_tpu.config import GameOptions, MCTSOptions, OptionMap, OptionSpec, TrainOptions
from elf_tpu.console.gtp import GtpConsole, GtpEngine

from elf_tpu.search.mcts import MCTSConfig
from elf_tpu.training.trainer import load_checkpoint


def main(argv=None):
    spec = OptionSpec.from_dataclasses([GameOptions, MCTSOptions, TrainOptions])
    parser = spec.to_argparse()
    parser.add_argument("--load", type=str, default="",
                        help="checkpoint path (empty = random weights)")
    parser.add_argument("--resign_thres", type=float, default=0.05,
                        help="resign when mover value < -1 + this "
                             "(0 disables; README.rst:147 play uses 0.05)")
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

    # play settings (README.rst:147): no root noise, play-strength puct
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
    engine = GtpEngine(eval_builder, mcfg, size=g.board_size, komi=g.komi,
                       seed=g.seed, persistent_tree=mo.persistent_tree,
                       following_pass=g.following_pass,
                       resign_thres=args.resign_thres)
    engine.set_model(state.params, state.batch_stats)
    GtpConsole(engine).run()


if __name__ == "__main__":
    main()
