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

import functools
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

    fresh_legal = jnp.ones((B, size * size + 1), jnp.bool_)

    # `fresh` is an explicit argument: a closed-over device array would be
    # embedded as an HLO constant, forcing a device->host fetch of the
    # whole pytree at LOWERING time (slow/fragile over a remote tunnel)
    @jax.jit
    def rollout_chunk(fresh, core, legal, key):
        def body(carry, _):
            core, legal, key = carry
            key, k = jax.random.split(key)
            logits = jnp.where(legal, 0.0, -1e9)
            a = jax.random.categorical(k, logits, axis=1).astype(jnp.int32)
            core, info = engine.step_core(core, a, size)
            done = engine.is_terminal_core(core, size)
            core = tree_where(done, fresh, core)
            # legality rides along from the step's own analysis
            legal = jnp.where(done[:, None], fresh_legal, info.legal_next)
            return (core, legal, key), None

        (core, legal, key), _ = lax.scan(
            body, (core, legal, key), None, length=chunk
        )
        return core, legal, key

    rollout_chunk = functools.partial(rollout_chunk, fresh)
    core = engine.init_core(B, size)
    key = jax.random.PRNGKey(0)
    # warmup: first call compiles; a couple more settle the device tunnel /
    # dispatch pipeline into steady state (a single warmup call measurably
    # under-reports on cold remote backends)
    for _ in range(3):
        core, legal, key = rollout_chunk(core, legal if _ else fresh_legal, key)
        _ = np.asarray(core.ply[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        core, legal, key = rollout_chunk(core, legal, key)
    # fetch a real value: on some remote platforms block_until_ready alone
    # does not force execution of the chain
    _ = np.asarray(core.ply[:1])
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

    # chain iterations through the input so no call can be elided or served
    # from a value cache by the device tunnel.  `variables` is an explicit
    # argument (closed-over weights would be baked into the HLO as a
    # ~90 MB constant, fetched device->host at lowering).
    @jax.jit
    def chain(variables, x, _pi, v):
        return x + (v[:1, None, None, None] * 0), *fwd(variables, x)

    pi, v = fwd(variables, x)
    x, pi, v = chain(variables, x, pi, v)  # warm up the chain jit itself
    _ = np.asarray(v[:1])
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        x, pi, v = chain(variables, x, pi, v)
    _ = np.asarray(v[:1])
    dt = time.perf_counter() - t0
    return batch * n / dt


def bench_mcts_rollouts(B=16, rollouts=64, m=8, blocks=20, dim=256):
    """MCTS rollouts/s at the production net (BASELINE.md primary metric)."""
    from elf_tpu.env.go.engine import init_core
    from elf_tpu.env.go.state import MAX_AGZ_HISTORY
    from elf_tpu.models.resnet import ModelConfig, PolicyValueNet
    from elf_tpu.search.mcts import MCTSConfig, run_mcts

    cfg = ModelConfig(board_size=19, num_planes=18, num_block=blocks, dim=dim)
    model = PolicyValueNet(cfg)
    x = jnp.zeros((1, 19, 19, 18))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    mcfg = MCTSConfig(num_rollouts=rollouts, rollouts_per_batch=m,
                      rotation_flip=True)

    # weights enter via the argument list, not the closure (see above)
    @jax.jit
    def fn(variables, core, hist, hlen, rng):
        def eval_fn(feats, to_play):
            return model.apply(variables, feats, train=False)

        return run_mcts(core, hist, hlen, eval_fn, rng, mcfg, 19)

    core = init_core(B, 19)
    hist = jnp.zeros((B, MAX_AGZ_HISTORY, 361), jnp.int8)
    hlen = jnp.zeros((B,), jnp.int32)
    res, _ = fn(variables, core, hist, hlen, jax.random.PRNGKey(0))
    _ = np.asarray(res.mcts_policy[:1, :1])
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        res, _ = fn(variables, core, hist, hlen, jax.random.PRNGKey(i + 1))
        _ = np.asarray(res.mcts_policy[:1, :1])  # force execution
    dt = time.perf_counter() - t0
    return B * rollouts * n / dt


def _fwd_flops(batch, size=19, planes=18, blocks=20, dim=256, num_actions=362):
    """Forward FLOPs of the 20b256c net (2 x MACs), conv-dominated."""
    n2 = size * size
    f = n2 * 9 * planes * dim * 2                 # init conv
    f += 2 * blocks * n2 * 9 * dim * dim * 2      # residual trunk
    f += n2 * dim * 2 * 2 + n2 * 2 * num_actions * 2   # policy head
    f += n2 * dim * 1 * 2 + n2 * 256 * 2          # value head
    return f * batch


def _is_oom(e: Exception) -> bool:
    return "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e)


def bench_selfplay_prod(B=1024, rollouts=1600, m=8, blocks=20, dim=256):
    """Self-play at the production operating point: B lockstep boards x
    `rollouts` per move at 20b256c bf16 — the reference client plays 32
    games x 8 threads x 200 rollouts per GPU (start_client.sh:11-29); one
    chip runs the whole fleet shard as one array program.
    persistent_tree off matches the reference prod TSOptions default.

    Returns (moves_per_sec, rollouts_per_sec, games_per_hour_est)."""
    from elf_tpu.models.resnet import ModelConfig, PolicyValueNet
    from elf_tpu.search.mcts import MCTSConfig
    from elf_tpu.selfplay.actor import ActorConfig, SelfplayActor

    cfg = ModelConfig(board_size=19, num_planes=18, num_block=blocks, dim=dim)
    model = PolicyValueNet(cfg)
    x = jnp.zeros((1, 19, 19, 18))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def eval_builder(params, batch_stats):
        def eval_fn(feats, to_play):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                feats, train=False,
            )
        return eval_fn

    acfg = ActorConfig(board_size=19, batch=B, persistent_tree=False,
                       policy_distri_cutoff=30)
    mcfg = MCTSConfig(
        num_rollouts=rollouts, rollouts_per_batch=m, c_puct=0.85,
        virtual_loss=5, root_epsilon=0.25, root_alpha=0.03,
        ply_pass_enabled=160, rotation_flip=True,
        # bound peak NN activation memory (2048-leaf eval chunks) and
        # per-execution device time (10 sim batches per jit call): a
        # monolithic 200-batch search runs minutes on-device and the TPU
        # runtime kills it as a hung worker
        eval_chunk=2048,
        max_batches_per_call=10,
    )
    actor = SelfplayActor(acfg, mcfg, eval_builder, seed=0)
    params, batch_stats = variables["params"], variables["batch_stats"]
    actor.play_moves(params, batch_stats, 1)      # compile + warm
    t0 = time.perf_counter()
    actor.play_moves(params, batch_stats, 1)
    dt = time.perf_counter() - t0
    moves_ps = B / dt
    return moves_ps, B * rollouts / dt, moves_ps / 450.0 * 3600.0


def bench_train_step(bs=2048, blocks=20, dim=256, iters=4):
    """Train-step throughput at the reference server operating point
    (start_server.sh:10: batchsize 2048, 20b256c) with block remat.

    Returns (achieved_bs, steps_per_sec, achieved_tflops)."""
    from elf_tpu.config import TrainOptions
    from elf_tpu.models.resnet import ModelConfig
    from elf_tpu.training.trainer import Trainer

    floor = min(bs, 256)
    while bs >= floor:
        try:
            cfg = ModelConfig(board_size=19, num_planes=18, num_block=blocks,
                              dim=dim, remat=True)
            opts = TrainOptions(batchsize=bs, num_block=blocks, dim=dim)
            trainer = Trainer(cfg, opts)
            state = trainer.init_state(jax.random.PRNGKey(0))
            step = jax.jit(trainer.make_train_step(), donate_argnums=(0,))
            k = jax.random.PRNGKey(1)
            feats = jax.random.uniform(k, (bs, 19, 19, 18))
            pi = jnp.full((bs, 362), 1.0 / 362.0)
            winner = jnp.ones((bs,))
            state, stats = step(state, feats, pi, winner)   # compile
            # fetch a real value: on some remote device tunnels
            # block_until_ready alone does not wait for execution.  The
            # donated-carry chain makes every iteration a data dependency
            # of the last stats, so one end fetch forces all of them (and
            # the differing carries defeat any tunnel value cache).
            _ = float(jax.tree.leaves(stats)[0])
            t0 = time.perf_counter()
            for _ in range(iters):
                state, stats = step(state, feats, pi, winner)
            _ = float(jax.tree.leaves(stats)[0])
            dt = time.perf_counter() - t0
            sps = iters / dt
            # fwd + bwd + remat-recompute ~ 4x forward FLOPs
            tflops = 4 * _fwd_flops(bs, blocks=blocks, dim=dim) * sps / 1e12
            return bs, sps, tflops
        except Exception as e:  # noqa: BLE001
            if _is_oom(e) and bs > floor:
                print(f"# train bs={bs} OOM; halving", file=sys.stderr)
                bs //= 2
                continue
            raise
    return 0, 0.0, 0.0


def _hbm_info() -> str:
    try:
        st = jax.local_devices()[0].memory_stats()
        lim = st.get("bytes_limit", 0) / 2**30
        used = st.get("peak_bytes_in_use", st.get("bytes_in_use", 0)) / 2**30
        return f"{used:.1f}/{lim:.1f} GiB"
    except Exception:  # noqa: BLE001
        return "n/a"


def main():
    import os

    from elf_tpu.cache import enable_compilation_cache

    enable_compilation_cache()
    t_all = time.time()
    # soft wall-clock budget for the optional diagnostic stages: cold
    # remote compiles of the big graphs can run tens of minutes, and the
    # primary metric must never be lost to a harness timeout
    budget_s = float(os.environ.get("ELF_TPU_BENCH_BUDGET_S", "2400"))

    def over_budget(stage):
        if time.time() - t_all > budget_s:
            print(f"# skipping {stage}: over {budget_s:.0f}s budget "
                  f"(set ELF_TPU_BENCH_BUDGET_S to raise)", file=sys.stderr)
            return True
        return False

    env_sps = bench_env_steps()
    print(f"# env_steps/s (19x19, B=4096): {env_sps:,.0f}", file=sys.stderr)
    # the ONE stdout JSON line is emitted as soon as the primary metric
    # exists — later diagnostic stages write only to stderr, so a
    # mid-diagnostic kill cannot lose the metric
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_19x19_single_chip",
                "value": round(env_sps, 1),
                "unit": "steps/s",
                "vs_baseline": round(env_sps / 1_000_000.0, 4),
            }
        ),
        flush=True,
    )
    try:
        nn_sps = bench_nn_forward()
        print(f"# NN fwd evals/s (20b256c, bs=128): {nn_sps:,.0f}", file=sys.stderr)
        nn_sps_big = bench_nn_forward(batch=1024)
        print(
            f"# NN fwd evals/s (20b256c, bs=1024): {nn_sps_big:,.0f}",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"# NN bench failed: {e}", file=sys.stderr)
    try:
        mcts_rps = bench_mcts_rollouts()
        print(
            f"# MCTS rollouts/s (20b256c, B=16, 64 rollouts): {mcts_rps:,.0f}",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"# MCTS bench failed: {e}", file=sys.stderr)
    # --- production operating points (VERDICT r1 #1) ---
    try:
        if over_budget("train-step bench"):
            raise TimeoutError("budget")
        bs, sps, tflops = bench_train_step()
        print(
            f"# train step (20b256c, remat, bs={bs}): {sps:.3f} steps/s, "
            f"{tflops:,.1f} TFLOP/s, {sps * bs:,.0f} samples/s "
            f"[hbm {_hbm_info()}]",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"# train bench failed: {e}", file=sys.stderr)
    try:
        B = 1024
        while B >= 128:
            try:
                if over_budget("selfplay prod bench"):
                    raise TimeoutError("budget")
                mps, rps, gph = bench_selfplay_prod(B=B)
                print(
                    f"# selfplay prod (19x19, B={B}, 1600 rollouts, 20b256c): "
                    f"{mps:,.1f} moves/s, {rps:,.0f} rollouts/s, "
                    f"~{gph:,.0f} games/hour/chip [hbm {_hbm_info()}]",
                    file=sys.stderr,
                )
                break
            except Exception as e:  # noqa: BLE001
                if _is_oom(e) and B > 128:
                    print(f"# selfplay B={B} OOM; halving", file=sys.stderr)
                    B //= 2
                    continue
                raise
    except Exception as e:  # noqa: BLE001
        print(f"# selfplay prod bench failed: {e}", file=sys.stderr)
    print(f"# total bench time: {time.time()-t_all:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
