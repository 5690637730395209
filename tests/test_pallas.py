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
