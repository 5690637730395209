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
import optax

from elf_tpu.config import ReplayOptions, TrainOptions
from elf_tpu.models.resnet import ModelConfig, PolicyValueNet
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
    args = ap.parse_args(argv)

    from elf_tpu.cache import enable_compilation_cache, pin_platform_from_env

    pin_platform_from_env()
    enable_compilation_cache()
    size = 19
    replay = ReplayBuffer(ReplayOptions(num_reader=2, q_min_size=1,
                                        q_max_size=1000), seed=0)
    pipeline = TrainingPipeline(replay, size, seed=0,
                                num_future_actions=args.num_future_actions)
    n = OfflineLoader(pipeline, num_threads=8).load_dir(args.sgf_dir)
    print(json.dumps({"loaded_games": n}), flush=True)

    cfg = ModelConfig(board_size=size, num_planes=18, num_block=args.blocks,
                      dim=args.dim, use_bf16=True)
    model = PolicyValueNet(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 18)), train=False
    )
    params, bstats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(args.lr, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, bstats, opt_state, feats, pi_t, winner):
        def loss_fn(params):
            (log_pi, value), mut = model.apply(
                {"params": params, "batch_stats": bstats}, feats,
                train=True, mutable=["batch_stats"],
            )
            target = jnp.argmax(pi_t, axis=1)
            nll = -jnp.take_along_axis(log_pi, target[:, None], axis=1)[:, 0]
            v_loss = jnp.mean((value - winner) ** 2)
            acc = (jnp.argmax(log_pi, axis=1) == target).mean()
            return nll.mean() + v_loss, (mut["batch_stats"], acc, nll.mean())

        grads, (new_bstats, acc, nll) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bstats, opt_state, acc, nll

    t0 = time.time()
    accs = []
    for step in range(args.steps):
        hb = pipeline.sample_host_batch(args.batch)
        feats, pi_t, winner = pipeline.device_batch(hb)
        params, bstats, opt_state, acc, nll = train_step(
            params, bstats, opt_state, feats, pi_t, winner
        )
        accs.append(float(acc))
        if step % 20 == 0 or step == args.steps - 1:
            print(json.dumps({
                "step": step,
                "t": round(time.time() - t0, 1),
                "top1_acc": round(float(acc), 4),
                "nll": round(float(nll), 4),
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
