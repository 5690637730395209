"""Action sampling from policies.

Counterpart of `/root/reference/src_py/rlpytorch/sampler/`
(`sampler.py:11` Sampler, `sample_methods.py:94` sample_multinomial /
`:128` epsilon_greedy): multinomial or greedy selection over a policy
head, with epsilon-uniform exploration mixed in, all vectorized and
jit-friendly (the reference loops per batch element in Python).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplerOptions:
    sample_policy: str = "epsilon-greedy"  # epsilon-greedy | multinomial | uniform
    greedy: bool = False                   # --store_greedy
    epsilon: float = 0.0


class Sampler:
    def __init__(self, opts: SamplerOptions):
        self.opts = opts

    def sample(self, pi: jax.Array, key: jax.Array,
               legal: Optional[jax.Array] = None) -> jax.Array:
        """pi [B, A] probabilities -> actions [B] (i32)."""
        opts = self.opts
        if legal is not None:
            pi = jnp.where(legal, pi, 0.0)
            pi = pi / jnp.maximum(pi.sum(axis=1, keepdims=True), 1e-10)
        B, A = pi.shape
        k_sel, k_eps, k_uni = jax.random.split(key, 3)

        greedy = opts.greedy or opts.sample_policy == "epsilon-greedy"
        if greedy:
            base = jnp.argmax(pi, axis=1)
        else:
            logits = jnp.log(jnp.maximum(pi, 1e-10))
            if legal is not None:
                logits = jnp.where(legal, logits, -1e9)
            base = jax.random.categorical(k_sel, logits, axis=1)

        if opts.epsilon > 0:
            # epsilon-mix with uniform (sample_eps_with_check)
            explore = jax.random.uniform(k_eps, (B,)) < opts.epsilon
            uni_logits = (
                jnp.where(legal, 0.0, -1e9)
                if legal is not None
                else jnp.zeros((B, A))
            )
            uniform = jax.random.categorical(k_uni, uni_logits, axis=1)
            base = jnp.where(explore, uniform, base)
        return base.astype(jnp.int32)
