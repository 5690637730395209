"""Policy/value ResNet — TPU-native counterpart of the reference
`Model_PolicyValue` (`/root/reference/src_py/elfgames/go/df_model3.py:113-306`).

Architecture parity (df_model3.py:288-306):
  input  [B, N, N, C]  (NHWC — TPU conv layout)
  trunk  3x3 conv(+bias) -> BN -> ReLU, then `num_block` residual blocks of
         (conv-BN-ReLU, conv-BN-ReLU) + skip, ReLU (see ResBlock docstring)
  policy 1x1 conv -> 2 ch -> BN -> ReLU -> dense (N*N+1) -> log_softmax
  value  1x1 conv -> 1 ch -> BN -> ReLU -> dense 256 -> ReLU -> dense 1 -> tanh

TPU-first choices: NHWC layout, bfloat16 compute with fp32 params and BN
statistics, channel dims padded to MXU-friendly multiples by construction
(256 = 2x128).  Data/tensor sharding is applied by the caller via
NamedSharding on params (see elf_tpu/parallel/).

BN semantics: the reference trains with `bn_momentum=0` (running stats :=
batch stats) and re-estimates BN in `num_cooldown` passes before
checkpointing (prepare_cooldown df_model3.py:277); `momentum` here is the
flax convention (running = momentum*running + (1-momentum)*batch), i.e.
flax_momentum = 1 - torch_momentum; bn_momentum=0 (torch) -> 0.0 here means
"replace", handled by passing momentum=torch-style through `1 - m`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    board_size: int = 19
    num_planes: int = 18
    num_block: int = 20
    dim: int = 256
    value_hidden: int = 256
    bn_momentum: float = 0.0   # torch convention (df_model3 default 0.0)
    use_bf16: bool = True
    # rematerialize residual blocks in the backward pass: activations are
    # recomputed instead of stored, trading ~1/3 more FLOPs for O(blocks)
    # less HBM — required to fit the reference's bs=2048 train step
    # (start_server.sh:10) on a single chip
    remat: bool = False

    @property
    def num_actions(self) -> int:
        return self.board_size * self.board_size + 1

    @property
    def flax_bn_momentum(self) -> float:
        """torch->flax momentum conversion with the reference's quirk:
        df_model3.py passes `momentum=(bn_momentum or None)`, so 0.0 falls
        back to torch's default 0.1 (None actually means cumulative moving
        average; 0.1 is the close stationary equivalent).  A literal 0.0
        would freeze running stats at init — inference would then normalize
        with untrained statistics (a bug surfaced by the 9x9 learning demo:
        the trained net lost to its random init until this fix)."""
        m = self.bn_momentum if self.bn_momentum > 0 else 0.1
        return 1.0 - m


class ResBlock(nn.Module):
    """Residual block with the reference's exact op order (df_model3.py:81
    Block.forward): conv-BN-ReLU, conv-BN-ReLU, + skip, ReLU — note the
    second ReLU fires BEFORE the skip-add (the reference's `conv_upper`
    Sequential includes its ReLU), unlike the AGZ paper ordering.  Convs
    carry biases (nn.Conv2d default).  Both kept for checkpoint
    import compatibility (tools/import_torch.py)."""

    dim: int
    momentum: float
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.dim, (3, 3), padding="SAME", use_bias=True,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=self.momentum,
                         dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.dim, (3, 3), padding="SAME", use_bias=True,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=self.momentum,
                         dtype=jnp.float32, name="bn2")(y)
        y = nn.relu(y)
        return nn.relu(x + y.astype(x.dtype))


class PolicyValueNet(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """x: [B, N, N, C] float32 -> (log_pi [B, A], value [B])."""
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
        m = cfg.flax_bn_momentum
        x = x.astype(dtype)

        h = nn.Conv(cfg.dim, (3, 3), padding="SAME", use_bias=True,
                    dtype=dtype, name="init_conv")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=m,
                         dtype=jnp.float32, name="init_bn")(h)
        h = nn.relu(h).astype(dtype)

        block_cls = (
            nn.remat(ResBlock, static_argnums=(2,)) if cfg.remat else ResBlock
        )
        for i in range(cfg.num_block):
            h = block_cls(cfg.dim, m, dtype, name=f"block{i}")(h, train)

        # policy head (df_model3.py:288: 1x1 conv to 2 ch -> linear)
        p = nn.Conv(2, (1, 1), use_bias=True, dtype=dtype, name="pi_conv")(h)
        p = nn.BatchNorm(use_running_average=not train, momentum=m,
                         dtype=jnp.float32, name="pi_bn")(p)
        p = nn.relu(p)
        p = p.reshape(p.shape[0], -1)
        logits = nn.Dense(cfg.num_actions, dtype=jnp.float32, name="pi_fc")(
            p.astype(jnp.float32)
        )
        log_pi = jax.nn.log_softmax(logits, axis=-1)

        # value head (df_model3.py:295: 1x1 conv to 1 ch -> 256 -> 1 -> tanh)
        v = nn.Conv(1, (1, 1), use_bias=True, dtype=dtype, name="v_conv")(h)
        v = nn.BatchNorm(use_running_average=not train, momentum=m,
                         dtype=jnp.float32, name="v_bn")(v)
        v = nn.relu(v)
        v = v.reshape(v.shape[0], -1).astype(jnp.float32)
        v = nn.relu(nn.Dense(cfg.value_hidden, dtype=jnp.float32, name="v_fc1")(v))
        v = nn.Dense(1, dtype=jnp.float32, name="v_fc2")(v)
        value = jnp.tanh(v[:, 0])
        return log_pi, value


def init_params(cfg: ModelConfig, rng: jax.Array):
    """Returns (params, batch_stats)."""
    model = PolicyValueNet(cfg)
    dummy = jnp.zeros((1, cfg.board_size, cfg.board_size, cfg.num_planes))
    variables = model.init(rng, dummy, train=False)
    return variables["params"], variables["batch_stats"]


def apply_fn(cfg: ModelConfig):
    model = PolicyValueNet(cfg)

    def fwd(params, batch_stats, x, train: bool = False):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            (log_pi, value), mut = model.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            return (log_pi, value), mut["batch_stats"]
        log_pi, value = model.apply(variables, x, train=False)
        return log_pi, value

    return fwd
