"""Device-mesh parallelism: GSPMD shardings for the learner and actors.

TPU-native replacement for the reference's two parallelism mechanisms
(SURVEY.md §2.4): `nn.DataParallel` (df_model3.py:204) and NCCL
`DistributedDataParallel` (df_model3.py:213-247) both collapse into one
GSPMD-sharded train step over a `Mesh(('dp', 'tp'))`:

 - batch axis sharded over `dp` (gradient all-reduce becomes an XLA psum
   riding ICI, replacing NCCL all-reduce);
 - ResNet channel dims sharded over `tp` (Megatron-style pairing on the
   two convs of each residual block) — optional capability beyond the
   reference, which has no model parallelism (20b256c fits one chip).

Pipeline/sequence/expert axes intentionally do not exist here: the model
has no sequence dimension and no experts (SURVEY.md §2.4/§5 — "long-context
/ sequence parallelism: not present"), and at 20 blocks x 256 ch the
weights are ~90 MB — pp would only add bubble overhead.  `dp x tp` is the
full useful sharding space for this model family.

Everything uses `jax.jit` + `NamedSharding` (GSPMD), so the same code runs
single-chip (trivial mesh), on a pod slice, or on the forced-host-device
CPU mesh used by tests and the driver's multichip dry-run.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('dp', 'tp') mesh over the first n_devices devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    arr = np.array(devices).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


# Sharding rules matched against 'path/to/param' strings.  Convs are NHWC
# with kernels [kh, kw, in_ch, out_ch].
_PARAM_RULES = (
    (r"conv1/kernel$", P(None, None, None, "tp")),   # column-parallel
    (r"conv2/kernel$", P(None, None, "tp", None)),   # row-parallel
    (r"init_conv/kernel$", P(None, None, None, "tp")),
    (r"pi_fc/kernel$", P(None, None)),
    (r"v_fc1/kernel$", P(None, "tp")),
    (r"v_fc2/kernel$", P("tp", None)),
)


def _spec_for(path: str, leaf) -> P:
    if np.ndim(leaf) <= 1:
        return P()
    for pat, spec in _PARAM_RULES:
        if re.search(pat, path):
            return spec
    return P()


def _named_tree_map(f, tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        name = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        out.append(f(name, leaf))
    return jax.tree_util.tree_unflatten(treedef, out)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Pytree of NamedSharding for model params (tp rules; scalars/bn
    replicated)."""
    return _named_tree_map(
        lambda name, leaf: NamedSharding(mesh, _spec_for(name, leaf)), params
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def make_sharded_train_step(trainer, mesh: Mesh, template_state,
                            train_mode: str = "mcts"):
    """jit the Trainer train step with GSPMD shardings: batch over dp,
    params tp-sharded per _PARAM_RULES, optimizer state following params.
    train_mode "offline" shards the df_pred supervised step instead."""
    from elf_tpu.training.trainer import TrainState

    ps = param_shardings(mesh, template_state.params)
    # Optimizer state follows params: optax momentum/adam buffers are
    # param-shaped subtrees whose leaf paths END with the param path
    # (e.g. "0/trace/res_blocks_3/conv1/kernel"), so the $-anchored
    # _PARAM_RULES give them exactly the param's tp spec; scalar leaves
    # (step counts) fall through to P().  Replicating them instead would
    # reshard every momentum buffer around each step under tp>1.
    state_shardings = TrainState(
        params=ps,
        batch_stats=replicate(mesh, template_state.batch_stats),
        opt_state=_named_tree_map(
            lambda name, leaf: NamedSharding(mesh, _spec_for(name, leaf)),
            template_state.opt_state,
        ),
        step=NamedSharding(mesh, P()),
    )
    data = batch_sharding(mesh)
    step_fn = (
        trainer.make_offline_train_step()
        if train_mode == "offline"
        else trainer.make_train_step()
    )
    return jax.jit(
        step_fn,
        in_shardings=(state_shardings, data, data, data),
        # pytree-prefix: replicate every stats leaf
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
        # callers rebind state to the output; donating lets XLA update
        # params/opt_state in place instead of double-buffering them
        donate_argnums=(0,),
    ), state_shardings


def shard_state(state, state_shardings):
    return jax.device_put(state, state_shardings)
