"""Training losses — parity with the reference methods.

 - `mcts_prediction_loss`: the AlphaZero loss used by `df_kl`
   (`/root/reference/src_py/elfgames/go/mcts_prediction.py:33-88`):
   policy = -(mcts_scores * log_pi).sum(1).mean(), value = MSE(V, winner).
 - `multiple_prediction_loss`: supervised future-action NLL used by
   `df_pred` (`multiple_prediction.py:30`): NLL of the next action(s)
   (weighted 1/(i+1) per horizon), + value MSE, with top-1/top-5 accuracy.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def mcts_prediction_loss(
    log_pi: jax.Array,       # [B, A]
    value: jax.Array,        # [B]
    mcts_scores: jax.Array,  # [B, A] normalized visit distribution
    winner: jax.Array,       # [B] in {-1, +1} (black perspective)
    value_weight: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """value_weight scales the MSE term (reference parity = 1.0,
    mcts_prediction.py:33-88).  Small-replay runs overfit the value head
    long before the policy converges (every position of a game shares one
    winner label, so the effective value sample size is games, not
    positions); down-weighting it is the standard stabilizer."""
    policy_loss = -(mcts_scores * log_pi).sum(axis=1).mean()
    value_loss = jnp.mean((value - winner) ** 2)
    entropy = -(jnp.exp(log_pi) * log_pi).sum(axis=1).mean()
    total = policy_loss + value_weight * value_loss
    stats = {
        "loss/policy": policy_loss,
        "loss/value": value_loss,
        "loss/total": total,
        "entropy": entropy,
        "blackwin": (winner > 0).mean(),
    }
    return total, stats


def multiple_prediction_loss(
    log_pi: jax.Array,        # [B, A]
    value: jax.Array,         # [B]
    offline_a: jax.Array,     # [B, T] future actions (T horizons)
    winner: jax.Array,        # [B]
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    B = log_pi.shape[0]
    # single policy head predicts each future horizon, weighted 1/(i+1)
    total_policy = 0.0
    for i in range(offline_a.shape[1]):
        nll = -jnp.take_along_axis(log_pi, offline_a[:, i : i + 1], axis=1)[:, 0]
        total_policy = total_policy + nll.mean() / (i + 1)
    value_loss = jnp.mean((value - winner) ** 2)
    pred = jnp.argmax(log_pi, axis=1)
    top1 = (pred == offline_a[:, 0]).mean()
    top5_idx = jax.lax.top_k(log_pi, 5)[1]
    top5 = (top5_idx == offline_a[:, 0:1]).any(axis=1).mean()
    total = total_policy + value_loss
    stats = {
        "loss/policy": total_policy,
        "loss/value": value_loss,
        "loss/total": total,
        "acc/top1": top1,
        "acc/top5": top5,
    }
    return total, stats
