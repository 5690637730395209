"""Policy-only convnet — counterpart of the reference darkforest-style
`Model_Policy` (`/root/reference/src_py/elfgames/go/df_model.py:15`):
a deep stack of 3x3 convs (LeakyReLU + BN) predicting the next
`num_future_actions` moves with per-horizon softmax heads, trained with
the MultiplePrediction loss.  Defaults mirror the reference
(39 layers x 128 dim).  Used for supervised bootstrap (`df_policy` /
`df_pred` model families) and policy-only actors (actPolicyOnly path).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PolicyNetConfig:
    board_size: int = 19
    num_planes: int = 25        # df feature set
    num_layer: int = 39
    dim: int = 128
    num_future_actions: int = 1
    bn: bool = True
    leaky_relu: bool = True
    use_bf16: bool = True


class PolicyNet(nn.Module):
    cfg: PolicyNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        """x [B, N, N, C] -> log_pis [B, num_future_actions, N*N + 1].

        The reference heads cover only board moves (no pass logit); we add
        a pass logit (constant-zero bias channel) so the action space
        matches the 362-action framework convention.
        """
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
        act = (lambda h: nn.leaky_relu(h, 0.1)) if cfg.leaky_relu else nn.relu
        h = x.astype(dtype)
        for i in range(cfg.num_layer):
            h = nn.Conv(cfg.dim, (3, 3), padding="SAME", dtype=dtype,
                        name=f"conv{i}")(h)
            h = act(h)
            if cfg.bn:
                h = nn.BatchNorm(
                    use_running_average=not train, dtype=jnp.float32,
                    name=f"bn{i}",
                )(h).astype(dtype)
        out = nn.Conv(cfg.num_future_actions, (3, 3), padding="SAME",
                      dtype=jnp.float32, name="final_conv")(h.astype(jnp.float32))
        B = x.shape[0]
        n2 = cfg.board_size * cfg.board_size
        logits = out.reshape(B, n2, cfg.num_future_actions).transpose(0, 2, 1)
        pass_logit = self.param(
            "pass_bias", nn.initializers.constant(-6.0),
            (cfg.num_future_actions,),
        )
        pass_col = jnp.broadcast_to(
            pass_logit[None, :, None], (B, cfg.num_future_actions, 1)
        )
        logits = jnp.concatenate([logits, pass_col], axis=2)
        return jax.nn.log_softmax(logits, axis=2)


def init_policy_net(cfg: PolicyNetConfig, rng: jax.Array):
    model = PolicyNet(cfg)
    dummy = jnp.zeros((1, cfg.board_size, cfg.board_size, cfg.num_planes))
    variables = model.init(rng, dummy, train=False)
    return variables["params"], variables.get("batch_stats", {})
