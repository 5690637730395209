"""Learner runner: the training-server main loop.

Counterpart of `/root/reference/scripts/elfgames/go/train.py` +
`rlpytorch/runner/single_process.py`:
 - wait for sufficient self-play (train.py runner after_start,
   game_ctrl.h:72);
 - episodes of `num_minibatch` train steps sampling from the replay
   pipeline (single_process.py:57);
 - `num_cooldown` BN re-estimation passes before each checkpoint
   (single_process.py:101 cooldown passes);
 - save `save-<step>.bin` + notify the control plane of the new version
   (train.py:122 episode_summary -> notifyNewVersion).

The GSPMD mesh path: pass `mesh` to shard the train step over devices
(dp batch + tp channels, elf_tpu.parallel).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from elf_tpu.config import TrainOptions
from elf_tpu.logging_utils import get_indexed_logger
from elf_tpu.models.resnet import ModelConfig
from elf_tpu.training.pipeline import TrainingPipeline
from elf_tpu.training.trainer import (
    TrainState,
    Trainer,
    save_checkpoint,
)


class LearnerRunner:
    def __init__(
        self,
        trainer: Trainer,
        pipeline: TrainingPipeline,
        ckpt_dir: str,
        opts: TrainOptions,
        mesh=None,
        seed: int = 0,
        train_mode: str = "mcts",
    ):
        """train_mode: "mcts" (df_kl — AlphaZero MCTSPrediction on visit
        distributions) or "offline" (df_pred — supervised
        MultiplePrediction on the `offline_a` future-action targets)."""
        self.trainer = trainer
        self.pipeline = pipeline
        self.ckpt_dir = ckpt_dir
        self.opts = opts
        self.train_mode = train_mode
        self.logger = get_indexed_logger("training.LearnerRunner-")
        # learner<->selfplay coupling (train.py:70-78): when set, batches
        # containing records of a different selfplay version are skipped
        # (unless keep_prev_selfplay)
        self.version_provider = None       # () -> current selfplay version
        self.keep_prev_selfplay = True
        self.skipped_stale_batches = 0
        self.ckpt_keep = 10                # keep-last-k checkpoint cleanup
        self.mesh = mesh
        # multi-host learner (train_server.py --dist_*): rank 0 hosts the
        # replay + control plane and broadcasts each sampled host batch;
        # every process extracts features for its dp-local slice and the
        # GSPMD step spans the global mesh (the DistributedDataParallel
        # counterpart, df_model3.py:213-247)
        self.sync = None
        self.save_enabled = True
        if mesh is not None and jax.process_count() > 1:
            from elf_tpu.parallel.distributed import HostSync

            assert dict(mesh.shape).get("tp", 1) == 1, (
                "multi-host learner is dp-only: tp shards would leave "
                "params non-addressable per process for checkpointing"
            )
            self.sync = HostSync()
            self.save_enabled = self.sync.rank0
        self.state = trainer.init_state(jax.random.PRNGKey(seed))
        if mesh is not None:
            from elf_tpu.parallel.mesh import make_sharded_train_step, shard_state

            self._train_step, shardings = make_sharded_train_step(
                trainer, mesh, self.state, train_mode=train_mode
            )
            self.state = shard_state(self.state, shardings)
        else:
            # state buffers are donated: the runner always rebinds
            # self.state to the step output, so the old TrainState can be
            # updated in place (saves a params+opt_state HBM copy per step)
            step_fn = (
                trainer.make_offline_train_step()
                if train_mode == "offline"
                else trainer.make_train_step()
            )
            self._train_step = jax.jit(step_fn, donate_argnums=(0,))
        self._cooldown_step = jax.jit(
            trainer.make_cooldown_step(), donate_argnums=(0,)
        )

    def _sample_checked(self, checked: bool = True):
        hb = self.pipeline.sample_host_batch(self.opts.batchsize)
        if hb is None:
            return None
        if (checked and self.version_provider is not None
                and not self.keep_prev_selfplay):
            cur = int(self.version_provider())
            if (hb.selfplay_ver != cur).any():
                # stale in-flight batch after a promotion (train.py:72)
                self.skipped_stale_batches += 1
                self.logger.info(
                    "skipping batch with selfplay_ver != %d", cur
                )
                return None
        return hb

    def _multihost_batch(self, checked: bool = True):
        """Collective: rank 0 samples (and stale-checks); every process
        gets the whole host batch, or None if rank 0 had nothing."""
        from elf_tpu.training.pipeline import HostBatch

        hb = self._sample_checked(checked) if self.sync.rank0 else None
        if not self.sync.flag(hb is not None):
            return None
        if hb is None:
            hb = self.pipeline.zero_host_batch(self.opts.batchsize)
        return HostBatch(*self.sync.tree(tuple(hb)))

    def _local_slice(self, hb):
        """This process's dp-contiguous rows of the global batch (device
        order is process-major, so dp rows [pid*per, (pid+1)*per) live on
        this process's devices)."""
        from elf_tpu.training.pipeline import HostBatch

        per = self.opts.batchsize // self.sync.process_count
        pi = jax.process_index()
        sl = slice(pi * per, (pi + 1) * per)
        return HostBatch(*[None if a is None else a[sl] for a in hb])

    def _globalize(self, x):
        """Assemble per-process feature shards into one global P('dp')
        array on the mesh (jit cannot reshard non-addressable inputs)."""
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as P

        return multihost_utils.host_local_array_to_global_array(
            np.asarray(x), self.mesh, P("dp")
        )

    def run_minibatch(self) -> Optional[Dict[str, float]]:
        offline = self.train_mode == "offline"
        if self.sync is not None:
            hb = self._multihost_batch()
            if hb is None:
                return None
            local = self._local_slice(hb)
            fn = (self.pipeline.device_batch_offline if offline
                  else self.pipeline.device_batch)
            feats, target, winner = (self._globalize(a) for a in fn(local))
        else:
            hb = self._sample_checked()
            if hb is None:
                return None
            feats, target, winner = (
                self.pipeline.device_batch_offline(hb) if offline
                else self.pipeline.device_batch(hb)
            )
        self.state, stats = self._train_step(self.state, feats, target, winner)
        if self.sync is not None:
            # replicated global scalars -> per-process numpy (escape hatch)
            from jax.experimental import multihost_utils

            stats = multihost_utils.process_allgather(stats, tiled=True)
        return {k: float(v) for k, v in stats.items()}

    def run_cooldown(self) -> int:
        """BN re-estimation passes before checkpointing."""
        n = 0
        for _ in range(self.opts.num_cooldown):
            if self.sync is not None:
                hb = self._multihost_batch(checked=False)
                if hb is None:
                    break
                feats, _, _ = self.pipeline.device_batch(
                    self._local_slice(hb)
                )
                feats = self._globalize(feats)
            else:
                hb = self.pipeline.sample_host_batch(self.opts.batchsize)
                if hb is None:
                    break
                feats, _, _ = self.pipeline.device_batch(hb)
            self.state = self._cooldown_step(self.state, feats)
            n += 1
        return n

    def episode(self, num_minibatch: int) -> Dict[str, float]:
        """One training episode; returns averaged stats."""
        agg: Dict[str, list] = {}
        done = 0
        while done < num_minibatch:
            stats = self.run_minibatch()
            if stats is None:
                time.sleep(0.5)
                continue
            done += 1
            for k, v in stats.items():
                agg.setdefault(k, []).append(v)
        return {k: float(np.mean(v)) for k, v in agg.items()}

    @staticmethod
    def _host_leaf(x):
        """Local view of a replicated leaf (multi-host arrays are not
        fully addressable; the local shard of a replicated / tp=1 leaf IS
        the whole array)."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            x = x.addressable_shards[0].data
        return np.asarray(x)

    def version(self) -> int:
        """Current model version (= train step), multi-host safe."""
        return int(self._host_leaf(self.state.step))

    def episode_summary(self) -> int:
        """Cooldown + checkpoint; returns the new model version (= step).
        Multi-host: every process runs the (collective) cooldown, rank 0
        writes the checkpoint."""
        self.run_cooldown()
        state = self.state
        if self.sync is not None:
            state = jax.tree.map(self._host_leaf, state)
        ver = int(np.asarray(state.step))
        if self.save_enabled:
            path = save_checkpoint(self.ckpt_dir, state, keep=self.ckpt_keep)
            self.logger.info("saved %s (version %d)", path, ver)
        return ver
