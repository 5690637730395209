"""Model-family registry — the `Models = {name: [Model, Method]}` mapping +
`load_env` composition of the reference (`/root/reference/src_py/
elfgames/go/df_model3.py:310`, `rlpytorch/model_loader.py:192`).

Each entry pairs a network constructor with its training-loss method:
  df_kl     PolicyValueNet + mcts_prediction_loss   (AlphaZero training)
  df_pred   PolicyValueNet + multiple_prediction_loss (supervised moves)
  df_policy PolicyNet      + multiple_prediction_loss (policy-only CNN)
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

from elf_tpu.models.policy_net import PolicyNet, PolicyNetConfig
from elf_tpu.models.resnet import ModelConfig, PolicyValueNet
from elf_tpu.training.loss import mcts_prediction_loss, multiple_prediction_loss


class ModelFamily(NamedTuple):
    model_cls: type
    config_cls: type
    loss_fn: Callable
    feature_set: str  # "agz" (18 planes) or "df" (25 planes)


MODELS: Dict[str, ModelFamily] = {
    "df_kl": ModelFamily(PolicyValueNet, ModelConfig, mcts_prediction_loss, "agz"),
    "df_pred": ModelFamily(
        PolicyValueNet, ModelConfig, multiple_prediction_loss, "agz"
    ),
    "df_policy": ModelFamily(
        PolicyNet, PolicyNetConfig, multiple_prediction_loss, "df"
    ),
}


def get_model_family(name: str) -> ModelFamily:
    if name not in MODELS:
        raise KeyError(f"unknown model family '{name}'; have {sorted(MODELS)}")
    return MODELS[name]
