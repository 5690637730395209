"""Multi-host runtime initialization.

TPU-native counterpart of the reference's NCCL `DistributedDataParallel`
bootstrap (`/root/reference/src_py/elfgames/go/df_model3.py:213-247`:
`--dist_url/rank/world_size` or SLURM env): on a TPU pod slice,
`jax.distributed.initialize` wires all hosts into one runtime, after which
the SAME GSPMD train step (parallel/mesh.py) spans every chip — gradient
all-reduce rides ICI as XLA-inserted psums, no NCCL/MPI calls.

Self-play scale-out remains process-per-host (each host runs clients
against the control server); only the learner needs the global mesh.
"""

from __future__ import annotations

import os
from typing import Optional

from elf_tpu.logging_utils import get_indexed_logger


def maybe_initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-host env/args are present.

    Env fallbacks: COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID (also
    the standard TPU pod metadata is auto-detected by jax on real pods —
    then a bare initialize() suffices)."""
    import jax

    logger = get_indexed_logger("parallel.distributed-")
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("PROCESS_ID")

    if coordinator is None and num_processes is None:
        if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
            jax.distributed.initialize()
            logger.info(
                "jax.distributed auto-initialized: %d processes, %d devices",
                jax.process_count(), len(jax.devices()),
            )
            return True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


class HostSync:
    """Rank-0-authoritative lockstep helpers for the multi-host learner.

    The control state of the training server — does a sampled batch
    exist?  keep looping?  which version was just promoted? — lives only
    on process 0, which hosts the TCP control plane and the replay buffer
    (the reference keeps the analogous state on the DDP rank-0 trainer,
    df_model3.py:213-247).  Every learner process runs the SAME loop and
    agrees on rank 0's decisions through device broadcasts.  All methods
    are collective: every process must call them in the same order, or
    the runtime deadlocks — exactly the NCCL contract the reference's
    DistributedDataParallel imposes.
    """

    def __init__(self):
        import jax

        self.rank0 = jax.process_index() == 0
        self.process_count = jax.process_count()

    def flag(self, value=False) -> int:
        """Broadcast an int decided on process 0 (others pass anything)."""
        import numpy as np
        from jax.experimental import multihost_utils

        v = np.asarray([int(value) if self.rank0 else 0], np.int32)
        return int(multihost_utils.broadcast_one_to_all(v)[0])

    def tree(self, tree_or_template):
        """Broadcast a pytree of host arrays from process 0; non-0
        processes pass a same-structure/shape/dtype template (e.g.
        TrainingPipeline.zero_host_batch)."""
        import jax
        import numpy as np
        from jax.experimental import multihost_utils

        return jax.tree.map(
            np.asarray, multihost_utils.broadcast_one_to_all(tree_or_template)
        )
