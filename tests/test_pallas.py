"""Pallas liberty-fixpoint kernel: parity vs the XLA reference
implementations (interpret mode on CPU).

The kernel (`elf_tpu/env/go/pallas_kernels.py`) is the TPU hot path for
`engine.analyze_libs`; these tests pin its semantics to the neighbor- and
scan-propagation variants on random boards and on real game positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elf_tpu.env.go import engine
from elf_tpu.env.go.pallas_kernels import analyze_libs_pallas


def _random_boards(B, size, seed=0, density=3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, density, size=(B, size, size)).astype(np.int8)
    )


@pytest.mark.parametrize("size", [9, 19])
@pytest.mark.parametrize("B", [1, 5, 130])
def test_parity_random_boards(size, B):
    s = _random_boards(B, size, seed=size * 1000 + B)
    lm0, lx0 = engine._analyze_libs_neighbor(s, size)
    lm1, lx1 = analyze_libs_pallas(s, size, True)
    np.testing.assert_array_equal(np.asarray(lm0), np.asarray(lm1))
    np.testing.assert_array_equal(np.asarray(lx0), np.asarray(lx1))


def test_parity_snake_chains():
    """Worst-case convergence: one serpentine chain covering the board."""
    size = 9
    b = np.zeros((size, size), np.int8)
    for r in range(size):
        b[r, :] = 1
    # leave alternating gaps so the snake is one chain with few liberties
    for r in range(0, size - 1, 2):
        b[r + 1, :] = 0
        b[r + 1, -1 if (r // 2) % 2 == 0 else 0] = 1
    s = jnp.asarray(b[None])
    lm0, lx0 = engine._analyze_libs_neighbor(s, size)
    lm1, lx1 = analyze_libs_pallas(s, size, True)
    np.testing.assert_array_equal(np.asarray(lm0), np.asarray(lm1))
    np.testing.assert_array_equal(np.asarray(lx0), np.asarray(lx1))


@pytest.mark.parametrize("size", [9, 19])
def test_step_analysis_parity(size):
    """Fused step kernel (place → capture → analyze) vs the XLA path on
    positions reached by legal play, including passes and capture moves."""
    B = 16
    n2 = size * size
    core = engine.init_core(B, size)
    key = jax.random.PRNGKey(7)
    legal = jnp.ones((B, n2 + 1), jnp.bool_)
    for _ in range(30 if size == 9 else 50):
        key, k = jax.random.split(key)
        logits = jnp.where(legal, 0.0, -1e9)
        a = jax.random.categorical(k, logits, axis=1).astype(jnp.int32)
        core, info = engine.step_core(core, a, size)
        legal = info.legal_next

    key, k = jax.random.split(key)
    logits = jnp.where(legal, 0.0, -1e9)
    action = jax.random.categorical(k, logits, axis=1).astype(jnp.int32)
    # force a few passes to cover the no-placement path
    action = action.at[:3].set(n2)
    color = core.to_play.astype(jnp.int32)
    stones = core.stones

    # XLA reference: tentative place, capture, re-analyze
    is_pass = action >= n2
    p = jnp.clip(action, 0, n2 - 1)
    onehot_p = jnp.arange(n2, dtype=jnp.int32)[None, :] == p[:, None]
    place = (~is_pass)[:, None] & onehot_p
    s1 = jnp.where(place, color[:, None].astype(jnp.int8), stones)
    s1_2d = s1.reshape(B, size, size)
    lm1, _ = engine._analyze_libs_neighbor(s1_2d, size)
    opp = (3 - color).astype(jnp.int8)
    cap0 = ((s1_2d != 0) & (lm1 == engine._INF)
            & (s1_2d == opp[:, None, None]))
    s2_ref = jnp.where(cap0, 0, s1_2d)
    lm_ref, lx_ref = engine._analyze_libs_neighbor(s2_ref, size)

    from elf_tpu.env.go.pallas_kernels import step_analysis_pallas

    s2, lm, lx, cap = step_analysis_pallas(stones, action, color, size, True)
    np.testing.assert_array_equal(
        np.asarray(s2_ref.reshape(B, n2)), np.asarray(s2)
    )
    np.testing.assert_array_equal(np.asarray(lm_ref), np.asarray(lm))
    np.testing.assert_array_equal(np.asarray(lx_ref), np.asarray(lx))
    np.testing.assert_array_equal(
        np.asarray(cap0.reshape(B, n2)), np.asarray(cap)
    )


def test_parity_game_positions():
    """Boards reached by legal random play (realistic chain shapes)."""
    B, size = 8, 9
    core = engine.init_core(B, size)
    key = jax.random.PRNGKey(0)
    legal = jnp.ones((B, size * size + 1), jnp.bool_)
    for _ in range(40):
        key, k = jax.random.split(key)
        logits = jnp.where(legal, 0.0, -1e9)
        a = jax.random.categorical(k, logits, axis=1).astype(jnp.int32)
        core, info = engine.step_core(core, a, size)
        legal = info.legal_next
    s = core.stones.reshape(B, size, size)
    lm0, lx0 = engine._analyze_libs_neighbor(s, size)
    lm1, lx1 = analyze_libs_pallas(s, size, True)
    np.testing.assert_array_equal(np.asarray(lm0), np.asarray(lm1))
    np.testing.assert_array_equal(np.asarray(lx0), np.asarray(lx1))
