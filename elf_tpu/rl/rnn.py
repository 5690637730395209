"""Recurrent actor-critic utilities.

Counterpart of `/root/reference/src_py/rlpytorch/methods/rnn_actor_critic.py`
(:16 RNNActorCritic) + `trainer/lstm_trainer.py:18` (hidden-state threading)
+ `utils/hist_states.py:10` (HistState): the reference threads LSTM hidden
state through T-step history batches in a Python loop; here the recurrence
is one `lax.scan` and the loss reuses `actor_critic_loss`.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from elf_tpu.rl.methods import actor_critic_loss

# cell(params, carry, x_t) -> (carry, (pi_t [B, A], v_t [B]))
RecurrentCell = Callable


def unroll(cell: RecurrentCell, params, carry0, xs: jax.Array):
    """Run the cell over a [T, B, ...] input; returns (carry, pi [T,B,A],
    v [T,B])."""

    def body(carry, x):
        carry, out = cell(params, carry, x)
        return carry, out

    carry, (pis, vs) = lax.scan(body, carry0, xs)
    return carry, pis, vs


def rnn_actor_critic_loss(
    cell: RecurrentCell,
    params,
    carry0,
    xs: jax.Array,          # [T+1, B, ...] observations (last = bootstrap)
    actions: jax.Array,     # i32 [T, B]
    rewards: jax.Array,     # f32 [T, B]
    terminals: jax.Array,   # bool [T, B]
    gamma: float = 0.99,
    entropy_ratio: float = 0.01,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    _, pis, vs = unroll(cell, params, carry0, xs)
    return actor_critic_loss(
        pis[:-1], vs, actions, rewards, terminals,
        gamma=gamma, entropy_ratio=entropy_ratio,
    )


class HistState:
    """Rolling T-step history of observations per environment slot
    (utils/hist_states.py:10 + base/hist.h:20 HistT): maintained as a
    device array ring so `batch.hist(t)` style access is a slice."""

    def __init__(self, T: int, batch: int, obs_shape, dtype=jnp.float32):
        self.T = T
        self.buf = jnp.zeros((T, batch) + tuple(obs_shape), dtype)

    def push(self, obs: jax.Array) -> "HistState":
        new = HistState.__new__(HistState)
        new.T = self.T
        new.buf = jnp.concatenate([self.buf[1:], obs[None]], axis=0)
        return new

    def hist(self, t: int) -> jax.Array:
        """t-th oldest entry (t = T-1 is the most recent)."""
        return self.buf[t]
