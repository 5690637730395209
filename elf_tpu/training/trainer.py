"""Learner: jitted train step, optimizer, BN cooldown, checkpointing.

Counterpart of the reference training harness:
 - `ModelInterface` optimizers (`/root/reference/src_py/rlpytorch/
   model_interface.py:106`: sgd momentum / adam, weight decay) -> optax.
 - `Trainer.train` (`trainer/trainer.py:209`): zero_grad -> method.update ->
   update_weights, with a step counter; here one fused jitted step.
 - BN cooldown (`df_model3.py:277 prepare_cooldown` + single_process.py:101):
   `cooldown_step` re-estimates batch stats without touching weights.
 - `ModelSaver` (`trainer/utils.py:37`): save-<step>.bin checkpoints with a
   `latest` symlink and keep-last-k cleanup; implemented with flax
   serialization (msgpack) so checkpoints are host/framework portable.

The train step is pjit-ready: `Trainer.make_train_step` accepts shardings
from elf_tpu.parallel and compiles a GSPMD data-parallel step.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from elf_tpu.config import TrainOptions
from elf_tpu.models.resnet import ModelConfig, PolicyValueNet
from elf_tpu.training.loss import mcts_prediction_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array  # i32 scalar


def make_optimizer(opts: TrainOptions) -> optax.GradientTransformation:
    txs = []
    if opts.grad_clip_norm > 0:
        txs.append(optax.clip_by_global_norm(opts.grad_clip_norm))
    if opts.weight_decay > 0:
        txs.append(optax.add_decayed_weights(opts.weight_decay))
    if opts.opt_method == "adam":
        txs.append(optax.adam(opts.lr, eps=opts.adam_eps))
    else:
        txs.append(optax.sgd(opts.lr, momentum=opts.momentum))
    return optax.chain(*txs)


class Trainer:
    def __init__(self, cfg: ModelConfig, opts: TrainOptions):
        self.cfg = cfg
        self.opts = opts
        self.model = PolicyValueNet(cfg)
        self.tx = make_optimizer(opts)

    def init_state(self, rng: jax.Array) -> TrainState:
        dummy = jnp.zeros(
            (1, self.cfg.board_size, self.cfg.board_size, self.cfg.num_planes)
        )
        variables = self.model.init(rng, dummy, train=False)
        params = variables["params"]
        return TrainState(
            params=params,
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    # -- jitted steps -------------------------------------------------------

    def make_train_step(self):
        model, tx = self.model, self.tx
        value_weight = self.opts.value_loss_weight

        def train_step(
            state: TrainState, features, mcts_scores, winner
        ) -> Tuple[TrainState, Dict[str, jax.Array]]:
            def loss_fn(params):
                (log_pi, value), mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    features,
                    train=True,
                    mutable=["batch_stats"],
                )
                loss, stats = mcts_prediction_loss(
                    log_pi, value, mcts_scores, winner,
                    value_weight=value_weight,
                )
                return loss, (stats, mut["batch_stats"])

            grads, (stats, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                step=state.step + 1,
            )
            stats["grad_norm"] = optax.global_norm(grads)
            return new_state, stats

        return train_step

    def make_offline_train_step(self):
        """Supervised (df_pred) step: MultiplePrediction over the
        multi-horizon `offline_a` targets (multiple_prediction.py:30) —
        the offline-training counterpart of make_train_step."""
        from elf_tpu.training.loss import multiple_prediction_loss

        model, tx = self.model, self.tx

        def train_step(
            state: TrainState, features, offline_a, winner
        ) -> Tuple[TrainState, Dict[str, jax.Array]]:
            def loss_fn(params):
                (log_pi, value), mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    features,
                    train=True,
                    mutable=["batch_stats"],
                )
                loss, stats = multiple_prediction_loss(
                    log_pi, value, offline_a, winner
                )
                return loss, (stats, mut["batch_stats"])

            grads, (stats, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                step=state.step + 1,
            )
            stats["grad_norm"] = optax.global_norm(grads)
            return new_state, stats

        return train_step

    def make_cooldown_step(self):
        """BN re-estimation pass: updates batch_stats only
        (prepare_cooldown + cooldown passes, single_process.py:101)."""
        model = self.model

        def cooldown_step(state: TrainState, features) -> TrainState:
            _, mut = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                features,
                train=True,
                mutable=["batch_stats"],
            )
            return state._replace(batch_stats=mut["batch_stats"])

        return cooldown_step

    def make_eval_fn(self):
        """Inference forward: features -> (log_pi, value)."""
        model = self.model

        def eval_fn(params, batch_stats, features):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                features,
                train=False,
            )

        return eval_fn


# ---------------------------------------------------------------------------
# checkpointing (ModelSaver parity: save-<step>.bin + latest symlink)
# ---------------------------------------------------------------------------

_CKPT_RE = re.compile(r"save-(\d+)\.bin$")


def save_checkpoint(
    directory: str, state: TrainState, keep: int = 10
) -> str:
    os.makedirs(directory, exist_ok=True)
    step = int(state.step)
    path = os.path.join(directory, f"save-{step}.bin")
    payload = {
        "params": jax.device_get(flax.serialization.to_state_dict(state.params)),
        "batch_stats": jax.device_get(
            flax.serialization.to_state_dict(state.batch_stats)
        ),
        "opt_state": jax.device_get(
            flax.serialization.to_state_dict(state.opt_state)
        ),
        "step": step,
    }
    with open(path + ".tmp", "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    os.replace(path + ".tmp", path)

    latest = os.path.join(directory, "latest")
    tmp_link = latest + ".tmp"
    try:
        if os.path.lexists(tmp_link):
            os.remove(tmp_link)
        os.symlink(os.path.basename(path), tmp_link)
        os.replace(tmp_link, latest)
    except OSError:
        pass

    # keep-last-k cleanup (trainer/utils.py ModelSaver)
    ckpts = sorted(
        (
            (int(m.group(1)), os.path.join(directory, f))
            for f in os.listdir(directory)
            if (m := _CKPT_RE.search(f))
        ),
    )
    for _, old in ckpts[:-keep]:
        try:
            os.remove(old)
        except OSError:
            pass
    return path


def save_params_checkpoint(
    path: str, state: TrainState, dtype=jnp.bfloat16
) -> str:
    """Durable params-only export: params (+batch_stats) downcast to
    `dtype` and the step counter, WITHOUT optimizer state — ~48 MB at
    20b256c vs ~190 MB for a full TrainState.  `load_checkpoint` restores
    it onto a template (optimizer momentum restarts fresh), so a run whose
    full save-<step>.bin files were pruned can still resume from the
    committed export."""
    cast = lambda t: jax.tree.map(
        lambda a: np.asarray(jax.device_get(a)).astype(dtype)
        if np.issubdtype(np.asarray(jax.device_get(a)).dtype, np.floating)
        else np.asarray(jax.device_get(a)),
        t,
    )
    payload = {
        "params": flax.serialization.to_state_dict(cast(state.params)),
        "batch_stats": flax.serialization.to_state_dict(
            cast(state.batch_stats)
        ),
        "step": int(state.step),
    }
    with open(path + ".tmp", "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    os.replace(path + ".tmp", path)
    return path


def load_checkpoint(
    path: str, template: Optional[TrainState] = None
) -> TrainState:
    """Load a checkpoint; with a `template`, arrays are restored onto its
    pytree structure (shape-checked).  Accepts both full TrainState
    checkpoints and params-only exports (save_params_checkpoint) — the
    latter restore with the template's fresh optimizer state."""
    if os.path.isdir(path):
        path = os.path.join(path, "latest")
    path = os.path.realpath(path)
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    if template is None:
        # structure-free restore: params/batch_stats as nested dicts,
        # opt_state left as a state dict (usable after from_state_dict
        # against a freshly built optimizer state)
        return TrainState(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload.get("opt_state"),
            step=jnp.asarray(payload["step"], jnp.int32),
        )

    def check(a, b):
        if hasattr(a, "shape") and hasattr(b, "shape") and a.shape != np.shape(b):
            raise ValueError(
                f"checkpoint shape mismatch {a.shape} vs {np.shape(b)}"
            )
        # restore at the template's dtype (fp32 master weights even when
        # loading a bf16 params-only export)
        if hasattr(a, "dtype"):
            return jnp.asarray(b, a.dtype)
        return jnp.asarray(b)

    params = flax.serialization.from_state_dict(template.params, payload["params"])
    batch_stats = flax.serialization.from_state_dict(
        template.batch_stats, payload["batch_stats"]
    )
    if "opt_state" in payload:
        opt_state = flax.serialization.from_state_dict(
            template.opt_state, payload["opt_state"]
        )
        opt_state = jax.tree.map(
            lambda a, b: jnp.asarray(b), template.opt_state, opt_state
        )
    else:
        opt_state = template.opt_state  # params-only export: fresh optimizer
    return TrainState(
        params=jax.tree.map(check, template.params, params),
        batch_stats=jax.tree.map(check, template.batch_stats, batch_stats),
        opt_state=opt_state,
        step=jnp.asarray(payload["step"], jnp.int32),
    )


def version_from_path(path: str) -> int:
    """Parse the model version from `save-<step>.bin` (train.py:20)."""
    m = _CKPT_RE.search(os.path.basename(os.path.realpath(path)))
    return int(m.group(1)) if m else -1
