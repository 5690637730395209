#!/usr/bin/env python
"""Decompose small-batch MCTS cost (the bench.py B=16 operating point).

Times three variants of the exact bench_mcts_rollouts configuration
(20b256c, B=16, 64 rollouts, m=8, rotation_flip):

  full       run_mcts with the real net            -> rollouts/s
  nn_only    the same NN eval sequence (1 root +
             rollouts/m sim batches of B*m leaves)
             inside one jitted scan                 -> the NN-bound
  tree_only  run_mcts with a constant-logits eval   -> pure tree ops

and prints a JSON breakdown.  `--trace_dir` additionally captures a
jax.profiler device trace of the full variant for op-level inspection.

Context (VERDICT r3 #3): B=16 MCTS measured 8,051 rollouts/s in round 1
and 7,290 in round 3; rounds 2-3 added in-tree superko legality and the
reference's unexplored-Q running mean (FPU) to the select loop.  This
script quantifies where the delta lives.
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--rollouts", type=int, default=64)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--blocks", type=int, default=20)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--trace_dir", type=str, default="")
    ap.add_argument("--rotation_flip", type=int, default=1)
    args = ap.parse_args(argv)

    from elf_tpu.cache import enable_compilation_cache, pin_platform_from_env

    pin_platform_from_env()
    enable_compilation_cache()

    from elf_tpu.env.go.engine import init_core
    from elf_tpu.env.go.state import MAX_AGZ_HISTORY
    from elf_tpu.models.resnet import ModelConfig, PolicyValueNet
    from elf_tpu.search.mcts import MCTSConfig, run_mcts

    B, rollouts, m = args.B, args.rollouts, args.m
    size, A = 19, 362
    cfg = ModelConfig(board_size=size, num_planes=18,
                      num_block=args.blocks, dim=args.dim)
    model = PolicyValueNet(cfg)
    x = jnp.zeros((1, size, size, 18))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    mcfg = MCTSConfig(num_rollouts=rollouts, rollouts_per_batch=m,
                      rotation_flip=bool(args.rotation_flip))

    core = init_core(B, size)
    hist = jnp.zeros((B, MAX_AGZ_HISTORY, size * size), jnp.int8)
    hlen = jnp.zeros((B,), jnp.int32)

    def timed(fn, fargs, label, vary_rng=False):
        """Per-iteration HOST FETCH, not block_until_ready: on remote
        device tunnels block_until_ready can return before execution
        completes, and a repeated call with identical args can be served
        from a tunnel value cache — vary the rng arg where the graph
        takes one so every iteration must really run."""
        def call(i):
            a = fargs[:-1] + (jax.random.PRNGKey(100 + i),) if vary_rng \
                else fargs
            out = fn(*a)
            return np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

        call(-1)
        t0 = time.perf_counter()
        for i in range(args.iters):
            call(i)
        dt = (time.perf_counter() - t0) / args.iters
        return dt

    # ---- full search ----------------------------------------------------
    @jax.jit
    def full(variables, core, hist, hlen, rng):
        def eval_fn(feats, to_play):
            return model.apply(variables, feats, train=False)

        res, _ = run_mcts(core, hist, hlen, eval_fn, rng, mcfg, size)
        return res.mcts_policy

    t_full = timed(full, (variables, core, hist, hlen,
                          jax.random.PRNGKey(1)), "full", vary_rng=True)

    # ---- NN-only: the same eval sequence (root bs=B + n_batches of B*m)
    n_batches = rollouts // m

    @jax.jit
    def nn_only(variables, feats_root, feats_sim, rng):
        # rng salt keeps repeated timing calls distinct for the tunnel
        feats_root = feats_root + rng[0].astype(jnp.float32) * 1e-20
        lp, v = model.apply(variables, feats_root, train=False)
        acc = lp.sum() + v.sum()

        def body(c, _):
            # carry-dependent input: without it XLA hoists the (then
            # loop-invariant) model application out of the scan and the
            # "NN bound" silently measures ONE eval instead of n_batches
            lp, v = model.apply(variables, feats_sim + c * 1e-20,
                                train=False)
            return c + lp.sum() + v.sum(), None

        acc, _ = jax.lax.scan(body, acc, None, length=n_batches)
        return acc

    froot = jnp.zeros((B, size, size, 18))
    fsim = jnp.zeros((B * m, size, size, 18))
    t_nn = timed(nn_only, (variables, froot, fsim, jax.random.PRNGKey(2)),
                 "nn_only", vary_rng=True)

    # ---- tree-only: constant-logits eval (no net in the graph) ----------
    @jax.jit
    def tree_only(core, hist, hlen, rng):
        def eval_fn(feats, to_play):
            K = feats.shape[0]
            return jnp.full((K, A), -np.log(A)), jnp.zeros((K,))

        res, _ = run_mcts(core, hist, hlen, eval_fn, rng, mcfg, size)
        return res.mcts_policy

    t_tree = timed(tree_only, (core, hist, hlen, jax.random.PRNGKey(2)),
                   "tree_only", vary_rng=True)

    if args.trace_dir:
        os.makedirs(args.trace_dir, exist_ok=True)
        with jax.profiler.trace(args.trace_dir):
            full(variables, core, hist, hlen,
                 jax.random.PRNGKey(3)).block_until_ready()

    total_r = B * rollouts
    print(json.dumps({
        "B": B, "rollouts": rollouts, "m": m,
        "blocks": args.blocks, "dim": args.dim,
        "t_full_ms": round(t_full * 1e3, 2),
        "t_nn_only_ms": round(t_nn * 1e3, 2),
        "t_tree_only_ms": round(t_tree * 1e3, 2),
        "rollouts_per_s_full": round(total_r / t_full),
        "rollouts_per_s_nn_bound": round(total_r / t_nn),
        "tree_overhead_ms": round((t_full - t_nn) * 1e3, 2),
        "nn_fraction": round(t_nn / t_full, 4),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
