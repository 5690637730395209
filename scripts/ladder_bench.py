#!/usr/bin/env python
"""Scored ladder-suite run: the reference's 116-scenario behavioral suite
(`/root/reference/ladder_suite/`, README.rst:173) as a benchmark.

For each (sgf, move#) probe the position is replayed and the engine must
produce the game's ladder-critical move.  Score = matched / total.

With `--load` this scores a trained checkpoint (including one imported
from the public pretrained-go-19x19-v2.bin via tools/import_torch.py —
not fetchable in a zero-egress environment); without, it scores the
raw-policy or MCTS play of a randomly initialized net (a floor, printed
for harness verification).

Example:
  python scripts/ladder_bench.py --load ckpts/save-100.bin \
      --num_block 20 --dim 256 --num_rollouts 400
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--load", type=str, default="",
                    help="checkpoint (empty = random weights)")
    ap.add_argument("--torch_import", type=str, default="",
                    help="import a reference torch checkpoint instead")
    ap.add_argument("--num_block", type=int, default=20)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--num_rollouts", type=int, default=0,
                    help="0 = raw policy argmax (no search)")
    ap.add_argument("--rollouts_per_batch", type=int, default=8)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args(argv)

    from elf_tpu.cache import enable_compilation_cache, pin_platform_from_env

    pin_platform_from_env()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from elf_tpu.env.go import features as gofeat, state as gostate
    from elf_tpu.models.resnet import ModelConfig, PolicyValueNet
    from elf_tpu.search.mcts import MCTSConfig, run_mcts
    from elf_tpu.tools.ladder import run_ladder_suite

    size = 19
    cfg = ModelConfig(board_size=size, num_planes=18, num_block=args.num_block,
                      dim=args.dim)
    model = PolicyValueNet(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 18)), train=False
    )
    params, bstats = variables["params"], variables["batch_stats"]
    if args.torch_import:
        from elf_tpu.tools.import_torch import load_torch_checkpoint

        params, bstats = load_torch_checkpoint(args.torch_import, cfg)
    elif args.load:
        from elf_tpu.training.trainer import Trainer, load_checkpoint
        from elf_tpu.config import TrainOptions

        trainer = Trainer(cfg, TrainOptions(num_block=args.num_block,
                                            dim=args.dim))
        state = load_checkpoint(
            args.load, template=trainer.init_state(jax.random.PRNGKey(0))
        )
        params, bstats = state.params, state.batch_stats

    def eval_fn(feats, to_play):
        return model.apply(
            {"params": params, "batch_stats": bstats}, feats, train=False
        )

    if args.num_rollouts > 0:
        mcfg = MCTSConfig(num_rollouts=args.num_rollouts,
                          rollouts_per_batch=args.rollouts_per_batch,
                          c_puct=1.5, rotation_flip=False)
        search = jax.jit(
            lambda core, hist, hlen, key: run_mcts(
                core, hist, hlen, eval_fn, key, mcfg, size
            )[0].best_action
        )

        def gen_move(state, sz):
            a = search(state.core, state.stone_hist, state.hist_len,
                       jax.random.PRNGKey(0))
            return int(np.asarray(a)[0])
    else:
        @jax.jit
        def raw_policy(state):
            feats = gofeat.extract_agz(
                state, jnp.zeros((1,), jnp.int32), size
            )
            log_pi, _ = eval_fn(feats, state.core.to_play)
            lm = gostate.legal_moves(state, size)
            return jnp.argmax(jnp.where(lm, log_pi, -1e9), axis=1)

        def gen_move(state, sz):
            return int(np.asarray(raw_policy(state))[0])

    t0 = time.time()
    res = run_ladder_suite(gen_move, limit=args.limit or None)
    print(json.dumps({
        "metric": "ladder_suite_accuracy",
        "matched": res.matched,
        "total": res.total,
        "accuracy": round(res.accuracy, 4),
        "mode": ("mcts%d" % args.num_rollouts) if args.num_rollouts
                else "raw_policy",
        "weights": ("import" if args.torch_import else
                    ("ckpt" if args.load else "random")),
        "wall_s": round(time.time() - t0, 1),
    }))
    for f in res.failures[:10]:
        print("# miss:", f, file=sys.stderr)


if __name__ == "__main__":
    main()
