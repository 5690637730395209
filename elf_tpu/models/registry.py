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


def family_feature_set(name: str, use_df_feature: bool = False) -> str:
    """The feature set a family trains/plays on ('agz' or 'df'); the
    --use_df_feature flag upgrades agz families to df-25."""
    fam = get_model_family(name)
    return "df" if (fam.feature_set == "df" or use_df_feature) else "agz"


def make_trainer(name: str, board_size: int, to, use_df_feature: bool = False):
    """The `load_env` composition (model_loader.py:192 + df_model3.py:310
    Models): model-family name + parsed TrainOptions -> a ready Trainer,
    its train mode, and the feature set to extract.

    Returns (trainer, train_mode, feature_set):
      df_kl   -> Trainer + "mcts"    (AlphaZero MCTSPrediction loss)
      df_pred -> Trainer + "offline" (supervised MultiplePrediction)
    df_policy (value-head-less PolicyNet) has no Trainer path — build it
    directly via models.policy_net.init_policy_net (see
    tests/test_offline_models.py)."""
    fam = get_model_family(name)
    if fam.model_cls is not PolicyValueNet:
        raise ValueError(
            f"model family '{name}' ({fam.model_cls.__name__}) has no "
            "value head; use elf_tpu.models.policy_net directly"
        )
    from elf_tpu.training.trainer import Trainer

    feature_set = family_feature_set(name, use_df_feature)
    cfg = ModelConfig(
        board_size=board_size,
        num_planes=25 if feature_set == "df" else 18,
        num_block=to.num_block,
        dim=to.dim,
        bn_momentum=to.bn_momentum,
        use_bf16=to.bf16,
    )
    train_mode = "mcts" if fam.loss_fn is mcts_prediction_loss else "offline"
    return Trainer(cfg, to), train_mode, feature_set
