#!/usr/bin/env python
"""Head-to-head checkpoint match: play two models against each other with
color-swapped halves and report win rate + Elo difference.

The standalone counterpart of the server-driven eval subsystem
(`/root/reference/src_cpp/elfgames/go/train/ctrl_eval.h`): same fair-pick
structure (half the games swapped), usable directly from the CLI to build
an Elo ladder across checkpoints.

Example:
  python scripts/eval_match.py --a /ckpts/save-2000.bin --b /ckpts/save-1000.bin \
      --num_games 64 --num_rollouts 200 --board_size 19
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from elf_tpu.config import GameOptions, MCTSOptions, OptionMap, OptionSpec, TrainOptions
from elf_tpu.models.resnet import ModelConfig
from elf_tpu.search.mcts import MCTSConfig
from elf_tpu.selfplay.actor import ActorConfig, SelfplayActor, make_pair_eval_builder
from elf_tpu.stats import WinRate
from elf_tpu.tools.match import elo_diff, head_to_head
from elf_tpu.training.trainer import Trainer, load_checkpoint


def main(argv=None):
    spec = OptionSpec.from_dataclasses([GameOptions, MCTSOptions, TrainOptions])
    parser = spec.to_argparse()
    parser.add_argument("--a", type=str, required=True, help="candidate ckpt")
    parser.add_argument("--b", type=str, required=True, help="baseline ckpt")
    parser.add_argument("--num_eval_games", type=int, default=64)
    args = parser.parse_args(argv)
    om = OptionMap(spec, vars(args))
    g = om.get(GameOptions)
    mo = om.get(MCTSOptions)
    to = om.get(TrainOptions)

    cfg = ModelConfig(
        board_size=g.board_size, num_planes=18,
        num_block=to.num_block, dim=to.dim, use_bf16=to.bf16,
    )
    from elf_tpu.cache import enable_compilation_cache, pin_platform_from_env

    pin_platform_from_env()
    enable_compilation_cache()
    trainer = Trainer(cfg, to)
    template = trainer.init_state(jax.random.PRNGKey(0))
    sa = load_checkpoint(args.a, template=template)
    sb = load_checkpoint(args.b, template=template)
    eval_raw = trainer.make_eval_fn()

    acfg = ActorConfig(
        board_size=g.board_size, batch=min(args.num_eval_games // 2, 32) or 1,
        komi=g.komi, policy_distri_cutoff=0,  # always argmax (eval strength)
        resign_thres=0.0, never_resign_prob=1.0,
    )
    # eval MCTS strips root noise (ctrl_eval.h:233)
    mcfg = MCTSConfig(
        num_rollouts=mo.num_rollouts, rollouts_per_batch=mo.rollouts_per_batch,
        c_puct=mo.c_puct, virtual_loss=mo.virtual_loss, root_epsilon=0.0,
        komi=g.komi,
    )
    actor = SelfplayActor(acfg, mcfg, make_pair_eval_builder(eval_raw), seed=g.seed)

    # the actor is reset at the half boundary (head_to_head) so the swap
    # half never inherits — and mis-scores — games started under the
    # noswap color assignment
    wr = WinRate()
    sink: list = []
    wins_a, total = head_to_head(
        actor,
        (sa.params, sa.batch_stats),
        (sb.params, sb.batch_stats),
        args.num_eval_games // 2,
        record_sink=sink,
    )
    for i, (r, a_won) in enumerate(sink):
        wr.feed(r.result.reward)
        print(
            f"game {i + 1}: {'A' if a_won else 'B'} wins "
            f"({r.result.num_move} moves)",
            file=sys.stderr,
        )

    winrate = wins_a / max(total, 1)
    print(
        f"A={os.path.basename(args.a)} vs B={os.path.basename(args.b)}: "
        f"{wins_a}/{total} = {winrate:.3f}  elo_diff={elo_diff(winrate):+.1f}  "
        f"({wr.summary()})"
    )


if __name__ == "__main__":
    main()
