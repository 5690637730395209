"""Generic RL harness tests: discounted returns vs hand-rolled reference,
policy-gradient weighting, actor-critic end-to-end improvement on a toy
MDP, Q-learning TD, sampler behavior, stats counters."""

import jax
import jax.numpy as jnp
import numpy as np

from elf_tpu.rl.methods import (
    actor_critic_loss,
    discounted_returns,
    policy_gradient_loss,
    q_learning_loss,
)
from elf_tpu.rl.rnn import HistState, rnn_actor_critic_loss, unroll
from elf_tpu.rl.sampler import Sampler, SamplerOptions
from elf_tpu.stats import MultiCounter, RLTimer, ValueStats, WinRate


class TestDiscountedReturns:
    def test_matches_reference_recursion(self):
        T, B = 5, 3
        rng = np.random.RandomState(0)
        r = rng.randn(T, B).astype(np.float32)
        term = rng.rand(T, B) < 0.3
        boot = rng.randn(B).astype(np.float32)
        R = np.asarray(discounted_returns(
            jnp.asarray(r), jnp.asarray(term), jnp.asarray(boot), gamma=0.9
        ))
        # reference loop (discounted_reward.py:31 feed), backwards
        expect = np.zeros_like(r)
        acc = boot.copy()
        for t in range(T - 1, -1, -1):
            acc = 0.9 * acc + r[t]
            acc = np.where(term[t], r[t], acc)
            expect[t] = acc
        np.testing.assert_allclose(R, expect, rtol=1e-6)


class TestPolicyGradient:
    def test_advantage_weighting(self):
        # positive advantage increases log-prob of the taken action
        pi = jnp.asarray([[0.5, 0.5]])
        a = jnp.asarray([0])

        def loss_fn(logits):
            p = jax.nn.softmax(logits)
            l, _ = policy_gradient_loss(p, a, jnp.asarray([1.0]),
                                        entropy_ratio=0.0)
            return l

        g = jax.grad(loss_fn)(jnp.zeros((1, 2)))
        assert g[0, 0] < 0  # gradient descent increases action-0 logit

    def test_importance_clamp(self):
        pi = jnp.asarray([[0.9, 0.1]])
        old = jnp.asarray([[0.01, 0.99]])
        a = jnp.asarray([0])
        l1, _ = policy_gradient_loss(pi, a, jnp.asarray([1.0]), old_pi=old,
                                     ratio_clamp=10.0, entropy_ratio=0.0)
        l2, _ = policy_gradient_loss(pi, a, jnp.asarray([1.0]), old_pi=old,
                                     ratio_clamp=2.0, entropy_ratio=0.0)
        # ratio 90 clamps to 10 vs 2 -> loss magnitudes differ by 5x
        np.testing.assert_allclose(float(l1) / float(l2), 5.0, rtol=1e-4)


class TestActorCritic:
    def test_toy_mdp_improves(self):
        """2-armed bandit: arm 0 pays 1, arm 1 pays 0.  A linear policy
        trained with actor_critic_loss must learn arm 0."""
        key = jax.random.PRNGKey(0)
        params = jnp.zeros((2,))
        T, B = 8, 16

        def step(params, key):
            logits = jnp.broadcast_to(params, (T, B, 2))
            pi = jax.nn.softmax(logits)
            a = jax.random.categorical(key, jnp.log(pi), axis=2)
            r = (a == 0).astype(jnp.float32)
            term = jnp.ones((T, B), bool)  # each step its own episode

            def loss_fn(params):
                logits = jnp.broadcast_to(params, (T, B, 2))
                pi = jax.nn.softmax(logits)
                values = jnp.zeros((T + 1, B))
                l, _ = actor_critic_loss(pi, values, a, r, term, gamma=0.9,
                                         entropy_ratio=0.0)
                return l

            g = jax.grad(loss_fn)(params)
            return params - 0.5 * g

        for i in range(50):
            key, k = jax.random.split(key)
            params = step(params, k)
        pi = jax.nn.softmax(params)
        assert float(pi[0]) > 0.8, f"did not learn: {pi}"


class TestQLearning:
    def test_td_target(self):
        q = jnp.asarray([[[1.0, 2.0]], [[3.0, 0.5]]])  # [T=2, B=1, A=2]
        a = jnp.asarray([[1]])
        r = jnp.asarray([[1.0]])
        term = jnp.asarray([[False]])
        loss, stats = q_learning_loss(q, a, r, term, gamma=0.5)
        # target = 1 + 0.5 * max(3, 0.5) = 2.5; q_sa = 2.0 -> (0.5)^2
        np.testing.assert_allclose(float(loss), 0.25, rtol=1e-6)


class TestRNN:
    def test_unroll_and_loss(self):
        def cell(params, carry, x):
            carry = jnp.tanh(carry + x @ params["w"])
            pi = jax.nn.softmax(carry[:, :2])
            v = carry[:, 2]
            return carry, (pi, v)

        T, B, D = 4, 3, 5
        params = {"w": jnp.ones((D, 8)) * 0.1}
        carry0 = jnp.zeros((B, 8))
        xs = jnp.ones((T + 1, B, D))
        carry, pis, vs = unroll(cell, params, carry0, xs)
        assert pis.shape == (T + 1, B, 2) and vs.shape == (T + 1, B)
        a = jnp.zeros((T, B), jnp.int32)
        r = jnp.ones((T, B))
        term = jnp.zeros((T, B), bool)
        loss, stats = rnn_actor_critic_loss(
            cell, params, carry0, xs, a, r, term
        )
        assert np.isfinite(float(loss))

    def test_hist_state(self):
        h = HistState(3, 2, (4,))
        h = h.push(jnp.ones((2, 4)))
        h = h.push(jnp.full((2, 4), 2.0))
        assert float(h.hist(2)[0, 0]) == 2.0  # newest
        assert float(h.hist(1)[0, 0]) == 1.0
        assert float(h.hist(0)[0, 0]) == 0.0  # oldest (pre-fill)


class TestSamplerStats:
    def test_sampler_greedy_and_eps(self):
        pi = jnp.asarray([[0.1, 0.9], [0.8, 0.2]])
        s = Sampler(SamplerOptions(sample_policy="epsilon-greedy", epsilon=0.0))
        a = np.asarray(s.sample(pi, jax.random.PRNGKey(0)))
        np.testing.assert_array_equal(a, [1, 0])
        s = Sampler(SamplerOptions(sample_policy="multinomial", epsilon=0.0))
        counts = np.zeros(2)
        for i in range(200):
            a = np.asarray(s.sample(pi, jax.random.PRNGKey(i)))
            counts[a[0]] += 1
        assert counts[1] > 140  # ~0.9 prob

    def test_sampler_legal_mask(self):
        pi = jnp.asarray([[0.9, 0.1]])
        legal = jnp.asarray([[False, True]])
        s = Sampler(SamplerOptions(epsilon=0.5))
        for i in range(20):
            a = int(s.sample(pi, jax.random.PRNGKey(i), legal=legal)[0])
            assert a == 1

    def test_stats(self):
        v = ValueStats("x")
        for x in [1.0, 2.0, 3.0]:
            v.feed(x)
        assert v.mean() == 2.0 and "max 3" in v.summary()
        mc = MultiCounter()
        mc.inc("games", 5)
        mc.feed("loss", 0.5)
        assert "games" in mc.summary(0)
        w = WinRate()
        w.feed(1.0); w.feed(-1.0); w.feed(1.0)
        assert abs(w.black_winrate() - 2 / 3) < 1e-9
        t = RLTimer()
        t.record("stage")
        assert "stage" in t.print()
