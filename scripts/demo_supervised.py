#!/usr/bin/env python
"""Supervised learning demo: predict human moves from real games.

Loads the reference ladder-suite SGFs (116 real 19x19 CGOS games) through
the offline loader and trains `df_pred`-style (multiple_prediction loss:
NLL of the played move + value MSE on the result).  Top-1 accuracy rising
far above the 1/362 chance floor is a direct, fast proof that the feature
pipeline, augmentation, model, and optimizer learn — independent of
self-play dynamics.

  python scripts/demo_supervised.py --steps 300
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


from elf_tpu.config import ReplayOptions, TrainOptions

from elf_tpu.training.offline import OfflineLoader
from elf_tpu.training.pipeline import TrainingPipeline
from elf_tpu.training.replay import ReplayBuffer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--sgf_dir", type=str,
                    default="/root/reference/ladder_suite/ladder")
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--num_future_actions", type=int, default=1,
                    help="multi-horizon MultiplePrediction targets")
    ap.add_argument("--model", type=str, default="df_pred",
                    help="model family (models/registry.py); df_pred is "
                         "the supervised MultiplePrediction family")
    ap.add_argument("--use_df_feature", type=int, default=0)
    args = ap.parse_args(argv)

    from elf_tpu.cache import enable_compilation_cache, pin_platform_from_env
    from elf_tpu.models.registry import make_trainer

    pin_platform_from_env()
    enable_compilation_cache()
    size = 19
    to = TrainOptions(batchsize=args.batch, num_block=args.blocks,
                      dim=args.dim, lr=args.lr, num_cooldown=0)
    trainer, train_mode, feature_set = make_trainer(
        args.model, size, to, use_df_feature=bool(args.use_df_feature)
    )
    replay = ReplayBuffer(ReplayOptions(num_reader=2, q_min_size=1,
                                        q_max_size=1000), seed=0)
    pipeline = TrainingPipeline(replay, size, seed=0,
                                num_future_actions=args.num_future_actions,
                                feature_set=feature_set)
    n = OfflineLoader(pipeline, num_threads=8).load_dir(args.sgf_dir)
    print(json.dumps({"loaded_games": n, "model": args.model,
                      "train_mode": train_mode,
                      "feature_set": feature_set}), flush=True)

    state = trainer.init_state(jax.random.PRNGKey(0))
    step_fn = jax.jit(
        trainer.make_offline_train_step() if train_mode == "offline"
        else trainer.make_train_step(),
        donate_argnums=(0,),
    )

    t0 = time.time()
    accs = []
    for step in range(args.steps):
        hb = pipeline.sample_host_batch(args.batch)
        if train_mode == "offline":
            feats, target, winner = pipeline.device_batch_offline(hb)
        else:
            feats, target, winner = pipeline.device_batch(hb)
        state, stats = step_fn(state, feats, target, winner)
        acc = float(stats.get("acc/top1", 0.0))
        nll = float(stats["loss/policy"])
        accs.append(acc)
        if step % 20 == 0 or step == args.steps - 1:
            print(json.dumps({
                "step": step,
                "t": round(time.time() - t0, 1),
                "top1_acc": round(acc, 4),
                "nll": round(nll, 4),
            }), flush=True)
    early = float(np.mean(accs[:10]))
    late = float(np.mean(accs[-10:]))
    print(json.dumps({
        "final": True,
        "acc_first10": round(early, 4),
        "acc_last10": round(late, 4),
        "chance_floor": round(1.0 / 362, 4),
        "learned": late > 10 * max(early, 1.0 / 362),
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
