"""Generic RL loss methods — JAX ports of `/root/reference/src_py/
rlpytorch/methods/`.

The reference implements these as stateful "Method" objects that walk a
T-step history batch backwards in Python and accumulate autograd errors;
here each is a pure function over `[T, B, ...]` trajectory arrays (scan
instead of a Python loop), returning (loss, stats) for use inside a jitted
train step.

Semantics parity:
 - `discounted_returns` (discounted_reward.py:10): R_T bootstrapped from
   the last value; R_t = gamma * R_{t+1} + r_t, reset to r_t at terminals.
 - `policy_gradient_loss` (policy_gradient.py:15): advantage-weighted NLL
   with log(pi + min_prob), entropy regularization `entropy_ratio`, and an
   importance-ratio clamp pi/old_pi <= ratio_clamp applied to the gradient
   weight (the reference's backward-hook grad scaling).
 - `actor_critic_loss` (actor_critic.py:14): T-step PG with advantage
   (R - V) + value-matching MSE to R.
 - `value_matcher_loss` (value_matcher.py:15): MSE(V, target).
 - `q_learning_loss` (q_learning.py:15): 1-step TD: Q(s_t, a_t) vs
   r_t + gamma * max_a Q(s_{t+1}, a), target detached, terminal-gated.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def discounted_returns(
    rewards: jax.Array,     # f32 [T, B]
    terminals: jax.Array,   # bool [T, B]
    bootstrap: jax.Array,   # f32 [B]   V at the step after the window
    gamma: float = 0.99,
) -> jax.Array:
    """R [T, B] computed backwards with terminal resets."""

    def body(R, inp):
        r, term = inp
        R = gamma * R + r
        R = jnp.where(term, r, R)
        return R, R

    _, Rs = lax.scan(body, bootstrap, (rewards, terminals), reverse=True)
    return Rs


def policy_gradient_loss(
    pi: jax.Array,             # f32 [N, A] action probabilities
    actions: jax.Array,        # i32 [N]
    advantages: jax.Array,     # f32 [N]  (stop-gradient applied inside)
    entropy_ratio: float = 0.01,
    min_prob: float = 1e-6,
    old_pi: Optional[jax.Array] = None,
    ratio_clamp: float = 10.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    log_pi = jnp.log(pi + min_prob)
    nll = -jnp.take_along_axis(log_pi, actions[:, None], axis=1)[:, 0]

    w = lax.stop_gradient(advantages)
    if old_pi is not None:
        # importance ratio, clamped (policy_gradient.py ratio_clamp)
        pa = jnp.take_along_axis(pi, actions[:, None], axis=1)[:, 0]
        oa = jnp.take_along_axis(old_pi, actions[:, None], axis=1)[:, 0]
        ratio = lax.stop_gradient(pa / jnp.maximum(oa, min_prob))
        w = w * jnp.clip(ratio, 0.0, ratio_clamp)

    policy_err = (nll * w).mean()
    entropy_err = (log_pi * pi).sum(axis=1).mean()  # negative entropy
    loss = policy_err + entropy_ratio * entropy_err
    return loss, {
        "pg/policy_err": policy_err,
        "pg/entropy": -entropy_err,
    }


def value_matcher_loss(
    value: jax.Array, target: jax.Array, grad_clip_norm: float = 0.0
) -> jax.Array:
    return jnp.mean((value - lax.stop_gradient(target)) ** 2)


def actor_critic_loss(
    pi: jax.Array,          # f32 [T, B, A]
    values: jax.Array,      # f32 [T+1, B]   (V at each step + bootstrap)
    actions: jax.Array,     # i32 [T, B]
    rewards: jax.Array,     # f32 [T, B]
    terminals: jax.Array,   # bool [T, B]
    gamma: float = 0.99,
    entropy_ratio: float = 0.01,
    min_prob: float = 1e-6,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    T, B, A = pi.shape
    R = discounted_returns(rewards, terminals, values[-1], gamma)  # [T, B]
    V = values[:-1]
    adv = R - lax.stop_gradient(V)
    pg_loss, pg_stats = policy_gradient_loss(
        pi.reshape(T * B, A),
        actions.reshape(T * B),
        adv.reshape(T * B),
        entropy_ratio=entropy_ratio,
        min_prob=min_prob,
    )
    v_loss = value_matcher_loss(V, R)
    loss = pg_loss + v_loss
    stats = {
        **pg_stats,
        "ac/value_loss": v_loss,
        "ac/mean_return": R.mean(),
        "ac/total": loss,
    }
    return loss, stats


def q_learning_loss(
    q: jax.Array,           # f32 [T, B, A]
    actions: jax.Array,     # i32 [T-1, B]
    rewards: jax.Array,     # f32 [T-1, B]
    terminals: jax.Array,   # bool [T-1, B]
    gamma: float = 0.99,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    q_sa = jnp.take_along_axis(q[:-1], actions[..., None], axis=2)[..., 0]
    q_next = lax.stop_gradient(q[1:].max(axis=2))
    target = rewards + gamma * jnp.where(terminals, 0.0, q_next)
    loss = jnp.mean((q_sa - target) ** 2)
    return loss, {"q/td_loss": loss, "q/mean_q": q_sa.mean()}
