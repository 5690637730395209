#!/usr/bin/env python
"""Training server: learner + control plane.

Counterpart of `/root/reference/scripts/elfgames/go/train.py` +
`start_server.sh`: starts the TCP control plane, waits for sufficient
self-play, then runs train episodes, checkpoints `save-<step>.bin`, and
notifies new versions for evaluation/promotion.

Example (prod-shaped, start_server.sh:10):
  python scripts/train_server.py --ckpt_dir /ckpts --batchsize 2048 \
      --num_block 20 --dim 256 --lr 0.01 --port 5556
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from elf_tpu.config import (
    ControlOptions,
    GameOptions,
    OptionSpec,
    ReplayOptions,
    TrainOptions,
)
from elf_tpu.logging_utils import configure, get_indexed_logger

from elf_tpu.training.pipeline import TrainingPipeline
from elf_tpu.training.runner import LearnerRunner
from elf_tpu.training.trainer import load_checkpoint, version_from_path
from elf_tpu.control.server import TrainServer


def main(argv=None):
    from elf_tpu.config import MCTSOptions

    spec = OptionSpec.from_dataclasses(
        [GameOptions, MCTSOptions, TrainOptions, ReplayOptions,
         ControlOptions]
    )
    parser = spec.to_argparse()
    parser.add_argument("--ckpt_dir", type=str, required=True)
    parser.add_argument("--num_minibatch", type=int, default=1000)
    parser.add_argument("--num_episodes", type=int, default=0,
                        help="0 = run forever")
    parser.add_argument("--target_promotions", type=int, default=0,
                        help="exit cleanly once this many eval-gated "
                             "promotions happened (0 = no target)")
    parser.add_argument("--max_seconds", type=float, default=0,
                        help="wall-clock budget; exit cleanly when "
                             "exceeded (0 = no budget)")
    parser.add_argument("--ckpt_keep", type=int, default=10,
                        help="keep-last-k checkpoints")
    parser.add_argument("--load", type=str, default="",
                        help="resume from checkpoint path or dir")
    parser.add_argument("--use_mesh", type=int, default=1,
                        help="GSPMD-shard the train step over all devices "
                             "(a single device gets the trivial 1-device "
                             "mesh: same code path, no collectives)")
    parser.add_argument("--dist_coordinator", type=str, default="",
                        help="host:port of the jax.distributed coordinator "
                             "— run one train_server.py process per host "
                             "with the same flags (+ --dist_process_id); "
                             "process 0 hosts the TCP control plane and "
                             "broadcasts batches, the GSPMD step spans the "
                             "global dp mesh (DistributedDataParallel "
                             "counterpart, df_model3.py:213-247)")
    parser.add_argument("--dist_num_processes", type=int, default=0)
    parser.add_argument("--dist_process_id", type=int, default=-1)
    parser.add_argument("--trace_dir", type=str, default="",
                        help="write a jax.profiler trace of the first "
                             "episode here (TensorBoard/Perfetto)")
    parser.add_argument("--loglevel", type=str, default="info")
    args = parser.parse_args(argv)
    om_values = vars(args)
    from elf_tpu.config import OptionMap

    om = OptionMap(spec, om_values)
    g = om.get(GameOptions)
    mo = om.get(MCTSOptions)
    to = om.get(TrainOptions)
    ro = om.get(ReplayOptions)
    co = om.get(ControlOptions)

    from elf_tpu.cache import enable_compilation_cache, pin_platform_from_env

    pin_platform_from_env()
    # distributed init must precede ANY backend query (enable_compilation_
    # cache calls jax.default_backend())
    if args.dist_coordinator:
        from elf_tpu.parallel.distributed import maybe_initialize_distributed

        assert maybe_initialize_distributed(
            coordinator=args.dist_coordinator,
            num_processes=args.dist_num_processes,
            process_id=args.dist_process_id,
        )
    enable_compilation_cache()
    configure(args.loglevel)
    logger = get_indexed_logger("scripts.train_server-")
    rank0 = jax.process_index() == 0

    # model-family selection (the reference's Models registry +
    # load_env composition): --model df_kl (AlphaZero) | df_pred
    # (supervised MultiplePrediction); the family also fixes the loss
    # and the feature set (df families extract 25 planes)
    from elf_tpu.models.registry import make_trainer

    trainer, train_mode, feature_set = make_trainer(
        g.model, g.board_size, to, use_df_feature=g.use_df_feature
    )

    if args.dist_coordinator:
        assert args.use_mesh, "--dist_* requires --use_mesh 1 (the multi-" \
            "host learner is the GSPMD step over the global mesh)"
    mesh = None
    if args.use_mesh:
        from elf_tpu.parallel.mesh import make_mesh

        n = len(jax.devices())
        # multi-host: dp-only (tp shards would leave params
        # non-addressable per process for checkpointing); single host
        # with 1 device gets the trivial mesh — same GSPMD code path
        tp = 2 if (n % 2 == 0 and n > 1 and jax.process_count() == 1) else 1
        mesh = make_mesh(n, tp=tp)
        logger.info("training on mesh %s (%d processes)",
                    dict(mesh.shape), jax.process_count())

    # pipeline + server wiring: accepted records flow into the pipeline
    from elf_tpu.training.replay import ReplayBuffer

    replay = ReplayBuffer(ro, seed=g.seed)
    pipeline = TrainingPipeline(
        replay, g.board_size, seed=g.seed,
        data_aug=g.data_aug,
        num_future_actions=g.num_future_actions,
        feature_set=feature_set,
    )
    runner = LearnerRunner(trainer, pipeline, args.ckpt_dir, to, mesh=mesh,
                           seed=g.seed, train_mode=train_mode)

    if args.load:
        runner.state = load_checkpoint(args.load, template=runner.state)
        logger.info("resumed from %s at step %d", args.load, int(runner.state.step))

    # the server DRIVES the fleet's search settings: every request ships
    # TSOptions built from this script's --num_rollouts/--c_puct/
    # --root_epsilon/... flags (model_pair.h:10); eval requests get the
    # noise-free variant server-side (ctrl_eval.h:233) so clients need no
    # local noise configuration at all
    from elf_tpu.selfplay.records import TSOptions

    runner.ckpt_keep = args.ckpt_keep
    sync = runner.sync  # HostSync under --dist_*, else None
    server = None
    if rank0:
        server = TrainServer(
            co, ro, port=co.port, record_sink=pipeline.insert_record,
            journal_dir=os.path.join(args.ckpt_dir, "journal"),
            mcts_opt=TSOptions.from_search_options(mo),
            promotion_log=os.path.join(args.ckpt_dir, "promotions.jsonl"),
        )
        server.replay = replay  # share the buffer
        if args.load:
            # server restart: rebuild replay from the record journal
            server.resume_from_journal()
        server.start()
    initial_ver = runner.version()
    # write the initial checkpoint BEFORE declaring ready: clients gate on
    # the status endpoint's ready=True and immediately load this version
    runner.episode_summary()
    if rank0:
        if co.eval_old_model >= 0:
            # eval-only bring-up: candidate = loaded model, baseline =
            # --eval_old_model (train.py:60 setEvalMode)
            server.set_eval_mode(initial_ver, co.eval_old_model)
        else:
            server.set_initial_version(initial_ver)
        logger.info("server up on :%d, initial version %d",
                    server.port, initial_ver)

        def on_promote(ver: int) -> None:
            logger.info("model %d promoted to selfplay baseline", ver)

        server.on_promote = on_promote
        # learner<->selfplay coupling: skip stale in-flight batches after
        # a promotion (train.py:70-78; multi-host: rank 0 stale-checks
        # before broadcasting, LearnerRunner._multihost_batch)
        runner.version_provider = server.selfplay.version
        runner.keep_prev_selfplay = co.keep_prev_selfplay

    from elf_tpu.profiling import Profiler

    prof = Profiler(trace_dir=args.trace_dir)
    try:
        logger.info("waiting for sufficient selfplay...")
        with prof.phase("wait_selfplay"):
            if sync is None:
                server.wait_for_sufficient_selfplay(timeout=86400)
            else:
                # collective: rank 0 polls the real gate, everyone agrees
                while True:
                    ok = bool(rank0 and server.wait_for_sufficient_selfplay(
                        timeout=0.5, poll=0.25))
                    if sync.flag(ok):
                        break
                    time.sleep(1.0)
        episode = 0
        t_start = time.time()
        while True:
            def _should_stop() -> bool:
                if args.num_episodes and episode >= args.num_episodes:
                    return True
                if (server is not None and args.target_promotions > 0
                        and len(server.promotions) >= args.target_promotions):
                    logger.info("target of %d promotions reached; exiting",
                                args.target_promotions)
                    return True
                if (args.max_seconds > 0
                        and time.time() - t_start > args.max_seconds):
                    logger.info("wall budget exhausted; exiting")
                    return True
                return False

            # multi-host: rank 0's verdict is authoritative (promotion
            # count and wall clock may diverge across hosts)
            if sync.flag(_should_stop()) if sync is not None else _should_stop():
                break
            episode += 1
            # device-trace only the first episode (trace files grow fast)
            tracer = prof.trace() if episode == 1 else _null_ctx()
            with tracer:
                with prof.phase("train_episode"):
                    stats = runner.episode(args.num_minibatch)
                with prof.phase("cooldown_checkpoint"):
                    ver = runner.episode_summary()
            with prof.phase("notify_eval"):
                if rank0:
                    server.notify_new_version(initial_ver, ver)
            logger.info(
                "episode %d: ver %d, %s | %s",
                episode, ver,
                {k: round(v, 4) for k, v in stats.items()},
                server.info() if rank0 else f"worker {jax.process_index()}",
            )
            logger.info("%s", prof.report())
    except KeyboardInterrupt:
        pass
    finally:
        if server is not None:
            server.stop()


def _null_ctx():
    import contextlib

    return contextlib.nullcontext()


if __name__ == "__main__":
    main()
