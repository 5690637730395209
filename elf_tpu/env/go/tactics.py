"""Vectorized tactical board analysis: eyes, false/semi eyes, self-atari.

Counterpart of the reference's board tactics API
(`/root/reference/src_cpp/elfgames/go/base/board.cc`):
  isEye        (board.cc:1850)  empty point whose 4 neighbors are all own
                                stones or off-board;
  isFakeEye    (board.cc:1887)  diagonal test: (edge & >=1 opp diag) or
                                (interior & >=2 opp diags);
  isTrueEye    (board.cc:1912)  eye and not fake;
  isSemiEye    (board.cc:1863)  eye whose diagonals hold exactly one
                                empty non-eye point (the strengthening /
                                falsifying move) and no opponent (edge) /
                                one opponent (interior);
  isSelfAtari  (board.cc:254)   "mimic the move and check": play the
                                stone and see whether its chain ends up
                                with exactly one liberty.

The reference computes these per queried point with pointer-chasing group
lists; here each is one whole-board masked array op over `[B, n2]`
(self-atari mimics ALL candidate moves at once by expanding the batch —
the array analog of the reference's copyBoard+Play per query).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from elf_tpu.env.go import engine
from elf_tpu.env.go.engine import EMPTY, GoCore, _INF, _shift

_DIAGS = ((-1, -1), (-1, 1), (1, -1), (1, 1))
_DIRS = ((-1, 0), (1, 0), (0, -1), (0, 1))


def _to2d(stones: jax.Array, size: int) -> jax.Array:
    return stones.reshape(stones.shape[0], size, size)


@functools.partial(jax.jit, static_argnums=(2,))
def eye_mask(stones: jax.Array, color: jax.Array, size: int) -> jax.Array:
    """bool [B, n2]: empty points whose 4 in-board neighbors are all
    `color` (isEye, board.cc:1850).  color: i8 [B] or scalar."""
    s2 = _to2d(stones, size)
    color = jnp.asarray(color, jnp.int8)
    c2 = color.reshape(-1, 1, 1) if color.ndim else color
    ok = s2 == EMPTY
    for dr, dc in _DIRS:
        nbr = _shift(s2, dr, dc, np.int8(-1))   # -1 = off-board sentinel
        ok = ok & ((nbr == c2) | (nbr == -1))
    return ok.reshape(stones.shape)


@functools.partial(jax.jit, static_argnums=(2,))
def fake_eye_mask(stones: jax.Array, color: jax.Array, size: int) -> jax.Array:
    """bool [B, n2] (isFakeEye, board.cc:1887).  Note the reference does
    NOT require the point to be an eye — this is the raw diagonal test."""
    s2 = _to2d(stones, size)
    color = jnp.asarray(color, jnp.int8)
    c2 = color.reshape(-1, 1, 1) if color.ndim else color
    opp = (3 - c2).astype(jnp.int8)
    n_opp = jnp.zeros(s2.shape, jnp.int32)
    n_edge = jnp.zeros(s2.shape, jnp.int32)
    for dr, dc in _DIAGS:
        nbr = _shift(s2, dr, dc, np.int8(-1))
        n_opp = n_opp + (nbr == opp)
        n_edge = n_edge + (nbr == -1)
    fake = ((n_edge > 0) & (n_opp >= 1)) | ((n_edge == 0) & (n_opp >= 2))
    return fake.reshape(stones.shape)


@functools.partial(jax.jit, static_argnums=(2,))
def true_eye_mask(stones: jax.Array, color: jax.Array, size: int) -> jax.Array:
    """isTrueEye (board.cc:1912): eye and not fake."""
    return eye_mask(stones, color, size) & ~fake_eye_mask(stones, color, size)


@functools.partial(jax.jit, static_argnums=(2,))
def semi_eye(stones: jax.Array, color: jax.Array, size: int):
    """(mask bool [B, n2], move i32 [B, n2]) — isSemiEye (board.cc:1863):
    an eye with exactly one empty non-eye diagonal (that diagonal is the
    strengthening/falsifying move) and no opponent diagonal on the edge /
    exactly one in the interior."""
    s2 = _to2d(stones, size)
    color = jnp.asarray(color, jnp.int8)
    c2 = color.reshape(-1, 1, 1) if color.ndim else color
    opp = (3 - c2).astype(jnp.int8)
    eyes2 = _to2d(eye_mask(stones, color, size).astype(jnp.int8), size)
    idx2 = jnp.broadcast_to(
        jnp.arange(size * size, dtype=jnp.int32).reshape(size, size), s2.shape
    )
    n_opp = jnp.zeros(s2.shape, jnp.int32)
    n_edge = jnp.zeros(s2.shape, jnp.int32)
    n_empty = jnp.zeros(s2.shape, jnp.int32)
    move = jnp.full(s2.shape, -1, jnp.int32)
    for dr, dc in _DIAGS:
        nbr = _shift(s2, dr, dc, np.int8(-1))
        nbr_eye = _shift(eyes2, dr, dc, np.int8(0)) > 0
        nbr_idx = _shift(idx2, dr, dc, np.int32(-1))
        is_empty_noneye = (nbr == EMPTY) & ~nbr_eye
        n_opp = n_opp + (nbr == opp)
        n_edge = n_edge + (nbr == -1)
        n_empty = n_empty + is_empty_noneye
        move = jnp.where(is_empty_noneye, nbr_idx, move)
    base = _to2d(eye_mask(stones, color, size), size)
    mask = base & (
        ((n_edge > 0) & (n_opp == 0) & (n_empty == 1))
        | ((n_edge == 0) & (n_opp == 1) & (n_empty == 1))
    )
    move = jnp.where(mask, move, -1)
    return mask.reshape(stones.shape), move.reshape(stones.shape)


@functools.partial(jax.jit, static_argnums=(1,))
def self_atari_mask(core: GoCore, size: int) -> jax.Array:
    """bool [B, n2]: points where the CURRENT player's move would leave
    its own chain with exactly one liberty (isSelfAtari, board.cc:254).

    Mimics every candidate move at once: the [B] batch expands to
    [B * n2] boards, each playing one point, then the engine's liberty
    analysis classifies the placed chain (lib_min == lib_max != INF is
    the atari class).  Analysis path, not the self-play hot loop."""
    B = core.stones.shape[0]
    n2 = size * size

    def rep(x):
        return jnp.repeat(x, n2, axis=0)

    big = GoCore(*(rep(f) for f in core))
    cand = jnp.tile(jnp.arange(n2, dtype=jnp.int32), B)
    stepped, info = engine.step_core(big, cand, size)
    s2 = stepped.stones.reshape(B * n2, size, size)
    lm, lx = engine.analyze_libs(s2, size)
    lm = lm.reshape(B * n2, n2)
    lx = lx.reshape(B * n2, n2)
    rows = jnp.arange(B * n2)
    atari = (lm[rows, cand] == lx[rows, cand]) & (lm[rows, cand] != _INF)
    placed = stepped.stones[rows, cand] == big.to_play
    ok = atari & placed & ~info.illegal
    return ok.reshape(B, n2)
