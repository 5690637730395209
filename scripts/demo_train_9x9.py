#!/usr/bin/env python
"""End-to-end learning demo: 9x9 self-play -> replay -> learner, in-process.

Runs the full AlphaZero loop with a small net and reports loss / entropy /
game statistics per iteration; finally plays the trained model against its
random initialization (color-swapped halves) as a learning check.  This is
the single-host "minimum end-to-end slice" of SURVEY.md §7.6 exercised for
real on TPU.

Note on the final check: at demo scale (minutes of training) both sides'
MCTS with terminal Tromp-Taylor shortcuts masks net-strength differences —
a >50% result needs a longer run.  For a fast, unambiguous proof that the
training stack learns, see scripts/demo_supervised.py (move-prediction
accuracy 47x above chance in 200 steps).

  python scripts/demo_train_9x9.py --iters 40 --out /tmp/demo9
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from elf_tpu.config import ReplayOptions, TrainOptions
from elf_tpu.models.resnet import ModelConfig
from elf_tpu.search.mcts import MCTSConfig
from elf_tpu.selfplay.actor import ActorConfig, SelfplayActor, make_pair_eval_builder
from elf_tpu.stats import WinRate
from elf_tpu.training.pipeline import TrainingPipeline
from elf_tpu.training.replay import ReplayBuffer
from elf_tpu.training.runner import LearnerRunner
from elf_tpu.training.trainer import Trainer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--out", type=str, default="/tmp/demo9")
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--dim", type=int, default=48)
    ap.add_argument("--batch_boards", type=int, default=96)
    ap.add_argument("--rollouts", type=int, default=48)
    ap.add_argument("--train_bs", type=int, default=256)
    ap.add_argument("--minibatches_per_iter", type=int, default=8)
    ap.add_argument("--eval_games", type=int, default=16)
    ap.add_argument("--final_eval", choices=["policy", "mcts", "both"],
                    default="both",
                    help="final trained-vs-random check: raw-policy play "
                    "(clean net-quality signal), MCTS play (strength at "
                    "the demo's rollout count), or both")
    args = ap.parse_args(argv)

    size = 9
    cfg = ModelConfig(board_size=size, num_planes=18, num_block=args.blocks,
                      dim=args.dim, use_bf16=True)
    to = TrainOptions(batchsize=args.train_bs, num_block=args.blocks,
                      dim=args.dim, lr=0.02, num_cooldown=4)
    from elf_tpu.cache import enable_compilation_cache, pin_platform_from_env

    pin_platform_from_env()
    enable_compilation_cache()
    trainer = Trainer(cfg, to)
    eval_raw = trainer.make_eval_fn()

    replay = ReplayBuffer(ReplayOptions(num_reader=8, q_min_size=2,
                                        q_max_size=2000), seed=0)
    pipeline = TrainingPipeline(replay, size, seed=0)
    runner = LearnerRunner(trainer, pipeline, args.out, to, seed=0)
    # random-init snapshot for the final eval: DEEP COPY — the train step
    # donates its state, which would delete these buffers otherwise
    import jax as _jax
    import jax.numpy as _jnp

    state0 = _jax.tree.map(_jnp.copy, runner.state)

    def builder(params, batch_stats):
        return lambda feats, to_play: eval_raw(params, batch_stats, feats)

    acfg = ActorConfig(board_size=size, batch=args.batch_boards, komi=7.5,
                       policy_distri_cutoff=10, resign_thres=0.0,
                       never_resign_prob=1.0)
    # ply_pass_enabled matters even at demo scale: with pass legal from
    # ply 0, the winning side's search (FPU gives unexplored pass the
    # parent-mean Q) pours visits into pass and the policy target teaches
    # the net to pass everywhere (the reference's production configs set
    # ply_pass_enabled=160 for exactly this reason, start_client.sh:24)
    mcfg = MCTSConfig(num_rollouts=args.rollouts, rollouts_per_batch=8,
                      c_puct=1.5, root_epsilon=0.25, root_alpha=0.2,
                      komi=7.5, ply_pass_enabled=40)
    actor = SelfplayActor(acfg, mcfg, builder, seed=1)

    wr = WinRate()
    t0 = time.time()
    for it in range(args.iters):
        recs = actor.play_moves(runner.state.params, runner.state.batch_stats, 12)
        for r in recs:
            pipeline.insert_record(r)
            wr.feed(r.result.reward)
        stats = None
        if replay.size() >= 32:
            for _ in range(args.minibatches_per_iter):
                stats = runner.run_minibatch() or stats
        line = {
            "iter": it,
            "t": round(time.time() - t0, 1),
            "games": actor.completed_games,
            "replay": replay.size(),
            "step": int(runner.state.step),
        }
        if stats:
            line.update({
                "loss": round(stats["loss/total"], 4),
                "policy_loss": round(stats["loss/policy"], 4),
                "value_loss": round(stats["loss/value"], 4),
                "entropy": round(stats["entropy"], 4),
            })
        print(json.dumps(line), flush=True)

    runner.episode_summary()

    # learning check: trained vs random init, swap halves, argmax play.
    # policy-only play (num_rollouts=0, the actPolicyOnly path) isolates net
    # quality; MCTS play measures strength at the demo's rollout count (where
    # terminal TT shortcuts can mask small-net differences).
    from elf_tpu.tools.match import head_to_head as _h2h

    def head_to_head(num_rollouts: int, seed: int):
        eval_actor = SelfplayActor(
            ActorConfig(board_size=size, batch=max(args.eval_games // 2, 1),
                        komi=7.5, policy_distri_cutoff=0, resign_thres=0.0,
                        never_resign_prob=1.0),
            MCTSConfig(num_rollouts=num_rollouts, rollouts_per_batch=8,
                       c_puct=1.5, root_epsilon=0.0, komi=7.5,
                       ply_pass_enabled=40),
            make_pair_eval_builder(eval_raw), seed=seed,
        )
        trained = (runner.state.params, runner.state.batch_stats)
        random0 = (state0.params, state0.batch_stats)
        return _h2h(eval_actor, trained, random0,
                    max(args.eval_games // 2, 1))

    summary = {
        "final": True,
        "selfplay_black_winrate": round(wr.black_winrate(), 3),
    }
    if args.final_eval in ("policy", "both"):
        w, n = head_to_head(0, seed=9)
        summary["policy_only_trained_vs_random"] = f"{w}/{n}"
        summary["policy_only_winrate"] = round(w / max(n, 1), 3)
    if args.final_eval in ("mcts", "both"):
        w, n = head_to_head(args.rollouts, seed=11)
        summary["mcts_trained_vs_random"] = f"{w}/{n}"
        summary["mcts_winrate"] = round(w / max(n, 1), 3)
    summary["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
