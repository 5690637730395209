"""Benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: 19x19 lockstep env throughput (steps/s on one chip) for a
4096-board batch where every step computes the full legal mask, samples a
random legal move, steps the engine, and auto-resets finished boards —
the BASELINE.md staged config (2).  `vs_baseline` is the fraction of the
1M env-steps/s pod-level north star (BASELINE.md), since the reference
publishes no throughput numbers of its own.

Extra diagnostics (NN fwd throughput, MCTS rollouts/s) go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def bench_env_steps(B=4096, size=19, chunk=64, iters=4):
    from elf_tpu.env.go import engine

    fresh = engine.init_core(B, size)

    def tree_where(cond, a, b):
        return jax.tree.map(
            lambda x, y: jnp.where(
                cond.reshape(cond.shape + (1,) * (x.ndim - 1)), x, y
            ),
            a,
            b,
        )

    @jax.jit
    def rollout_chunk(core, key):
        def body(carry, _):
            core, key = carry
            key, k = jax.random.split(key)
            lm = engine.legal_moves(core, size)
            logits = jnp.where(lm, 0.0, -1e9)
            a = jax.random.categorical(k, logits, axis=1).astype(jnp.int32)
            core, _ = engine.step_core(core, a, size)
            done = engine.is_terminal_core(core, size)
            core = tree_where(done, fresh, core)
            return (core, key), None

        (core, key), _ = lax.scan(body, (core, key), None, length=chunk)
        return core, key

    core = engine.init_core(B, size)
    key = jax.random.PRNGKey(0)
    core, key = rollout_chunk(core, key)  # warmup + compile
    jax.block_until_ready(core.stones)
    t0 = time.perf_counter()
    for _ in range(iters):
        core, key = rollout_chunk(core, key)
    jax.block_until_ready(core.stones)
    dt = time.perf_counter() - t0
    return B * chunk * iters / dt


def bench_nn_forward(batch=128, blocks=20, dim=256):
    from elf_tpu.models.resnet import ModelConfig, PolicyValueNet

    cfg = ModelConfig(board_size=19, num_planes=18, num_block=blocks, dim=dim)
    model = PolicyValueNet(cfg)
    x = jnp.zeros((batch, 19, 19, 18), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    out = fwd(variables, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        out = fwd(variables, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * n / dt


def main():
    t_all = time.time()
    env_sps = bench_env_steps()
    print(f"# env_steps/s (19x19, B=4096): {env_sps:,.0f}", file=sys.stderr)
    try:
        nn_sps = bench_nn_forward()
        print(f"# NN fwd evals/s (20b256c, bs=128): {nn_sps:,.0f}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"# NN bench failed: {e}", file=sys.stderr)
    print(f"# total bench time: {time.time()-t_all:.1f}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_19x19_single_chip",
                "value": round(env_sps, 1),
                "unit": "steps/s",
                "vs_baseline": round(env_sps / 1_000_000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
