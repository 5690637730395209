"""Full vectorized Go environment state: GoCore + histories.

TPU-native equivalent of the reference `GoState`
(`/root/reference/src_cpp/elfgames/go/base/go_state.h:95`): move history,
positional-superko detection over the hash history (go_state.cc:96), the
8-snapshot board history feeding the AGZ feature planes (go_state.cc:90,
board_feature.cc `extractAGZ`), per-point placement ply for the df feature
set, termination and Tromp-Taylor evaluation (go_state.h:145, :194).

Everything is ``[B, ...]`` lockstep arrays under jit; `reset_where` gives the
vectorized equivalent of a game thread restarting its finished game.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from elf_tpu.env.go import engine
from elf_tpu.env.go.engine import BLACK, EMPTY, WHITE, GoCore, StepInfo

MAX_AGZ_HISTORY = 8  # board_feature.h:39 MAX_NUM_AGZ_HISTORY


class GoState(NamedTuple):
    core: GoCore
    # ply at which the stone on each point was placed (board.cc _infos[].last_placed)
    last_placed: jax.Array    # i32 [B, N2]
    # last 8 post-move board snapshots, oldest first (go_state _history deque)
    stone_hist: jax.Array     # i8  [B, 8, N2]
    hist_len: jax.Array       # i32 [B]
    # pre-move position hashes for superko (go_state _board_hash)
    hash_hist_lo: jax.Array   # u32 [B, H]
    hash_hist_hi: jax.Array   # u32 [B, H]
    nhash: jax.Array          # i32 [B]
    superko: jax.Array        # bool [B]
    terminated: jax.Array     # bool [B]

    @property
    def size(self) -> int:
        return int(np.sqrt(self.core.stones.shape[-1]))


def init_state(batch: int, size: int) -> GoState:
    n2 = size * size
    max_h = 2 * n2 + 1
    return GoState(
        core=engine.init_core(batch, size),
        last_placed=jnp.zeros((batch, n2), jnp.int32),
        stone_hist=jnp.zeros((batch, MAX_AGZ_HISTORY, n2), jnp.int8),
        hist_len=jnp.zeros((batch,), jnp.int32),
        hash_hist_lo=jnp.zeros((batch, max_h), jnp.uint32),
        hash_hist_hi=jnp.zeros((batch, max_h), jnp.uint32),
        nhash=jnp.zeros((batch,), jnp.int32),
        superko=jnp.zeros((batch,), jnp.bool_),
        terminated=jnp.zeros((batch,), jnp.bool_),
    )


def _tree_where(cond: jax.Array, a, b):
    """Select between two pytrees per batch element."""
    def sel(x, y):
        c = cond.reshape(cond.shape + (1,) * (x.ndim - 1))
        return jnp.where(c, x, y)
    return jax.tree.map(sel, a, b)


@functools.partial(jax.jit, static_argnums=(2,))
def step(state: GoState, action: jax.Array, size: int) -> Tuple[GoState, StepInfo]:
    """Lockstep env step.  Terminated boards are frozen (no-op), matching
    `GoState::forward` returning false when terminated (go_state.cc:79)."""
    n2 = size * size
    B = action.shape[0]
    core2, info = engine.step_core(state.core, action, size)

    is_pass = action >= n2
    moved = (~info.illegal) & ~state.terminated
    placed = moved & ~is_pass

    # superko: new position equals a recorded pre-move position.
    # (checked only for stone moves; go_state.cc:99)
    k = jnp.arange(state.hash_hist_lo.shape[1])[None, :]
    in_hist = (
        (state.hash_hist_lo == core2.hash_lo[:, None])
        & (state.hash_hist_hi == core2.hash_hi[:, None])
        & (k < state.nhash[:, None])
    ).any(axis=1)
    new_superko = state.superko | (placed & in_hist)

    # append the pre-move hash (only for stone moves, go_state.cc:113).
    # One-hot compare instead of a scatter: per-row dynamic-index updates
    # lower to scalar loops on TPU.
    slot = jnp.clip(state.nhash, 0, state.hash_hist_lo.shape[1] - 1)
    at_slot = (k == slot[:, None]) & placed[:, None]
    hh_lo = jnp.where(at_slot, state.core.hash_lo[:, None], state.hash_hist_lo)
    hh_hi = jnp.where(at_slot, state.core.hash_hi[:, None], state.hash_hist_hi)
    nhash = jnp.where(placed, state.nhash + 1, state.nhash)

    # board snapshot history (pushed on every successful forward, incl. pass)
    pushed = jnp.concatenate(
        [state.stone_hist[:, 1:], core2.stones[:, None]], axis=1
    )
    stone_hist = jnp.where(moved[:, None, None], pushed, state.stone_hist)
    hist_len = jnp.where(
        moved, jnp.minimum(state.hist_len + 1, MAX_AGZ_HISTORY), state.hist_len
    )

    # last_placed stores the 1-based move number (board.cc:680 with 1-based _ply)
    p = jnp.clip(action, 0, n2 - 1)
    at_p = (jnp.arange(n2, dtype=jnp.int32)[None, :] == p[:, None]) & placed[:, None]
    lp = jnp.where(at_p, (state.core.ply + 1)[:, None], state.last_placed)

    # keep core frozen on terminated boards
    core_out = _tree_where(state.terminated, state.core, core2)
    terminated = state.terminated | (
        moved
        & (
            (core2.passes >= 2)
            | (core2.ply >= 2 * n2 - 1)
            | (placed & in_hist)
        )
    )

    info = StepInfo(
        illegal=info.illegal & ~state.terminated,
        captured=jnp.where(state.terminated, 0, info.captured),
        ko_created=info.ko_created & ~state.terminated,
        legal_next=info.legal_next & ~terminated[:, None],
    )
    return (
        GoState(
            core=core_out,
            last_placed=lp,
            stone_hist=stone_hist,
            hist_len=hist_len,
            hash_hist_lo=hh_lo,
            hash_hist_hi=hh_hi,
            nhash=nhash,
            superko=new_superko,
            terminated=terminated,
        ),
        info,
    )


@functools.partial(jax.jit, static_argnums=(1,))
def legal_moves(state: GoState, size: int) -> jax.Array:
    """[B, N2+1] mask; all-False on terminated boards."""
    lm = engine.legal_moves(state.core, size)
    return lm & ~state.terminated[:, None]


@functools.partial(jax.jit, static_argnums=(1, 2))
def evaluate(state: GoState, size: int, komi: float = 7.5) -> jax.Array:
    """f32 [B] final score from black's perspective (go_state.h:194):
    superko -> +-1 for the player to move; else TT score - komi."""
    tt = engine.score_tromp_taylor(state.core, size).astype(jnp.float32) - komi
    superko_val = jnp.where(state.core.to_play == BLACK, 1.0, -1.0)
    return jnp.where(state.superko, superko_val, tt)


def reset_where(state: GoState, mask: jax.Array, size: int,
                handicap: int = 0) -> GoState:
    """Reset boards where mask is True (vectorized game restart)."""
    fresh = init_state(state.core.stones.shape[0], size)
    if handicap > 0:
        fresh = apply_handicap(fresh, handicap, size)
    return _tree_where(mask, fresh, state)


# Handicap placements (go_state.cc:33 HandicapTable, darkforestGo table).
_HANDICAPS = {
    2: ["D4", "Q16"],
    3: ["D4", "Q16", "Q4"],
    4: ["D4", "Q16", "D16", "Q4"],
    5: ["D4", "Q16", "D16", "Q4", "K10"],
    6: ["D4", "Q16", "D16", "Q4", "D10", "Q10"],
    7: ["D4", "Q16", "D16", "Q4", "D10", "Q10", "K10"],
    8: ["D4", "Q16", "D16", "Q4", "D10", "Q10", "K16", "K4"],
    9: ["D4", "Q16", "D16", "Q4", "D10", "Q10", "K16", "K4", "K10"],
}


def _handicap_flat(s: str, size: int) -> int:
    """The reference's own handicap-coordinate semantics (go_state.cc:25
    s2c): letter -> 0-based index-from-top with 'I' skipped, number-1 ->
    second index.  NOT the GTP row-from-bottom convention — for handicap 2
    the reference places (3,3)/(15,15), verified bit-exactly against the
    compiled reference library (tests/golden/ref_traj_19.jsonl.gz)."""
    row = ord(s[0]) - ord("A")
    if row >= 9:
        row -= 1
    col = int(s[1:]) - 1
    if not (0 <= row < size and 0 <= col < size):
        raise ValueError(f"off-board handicap point {s} on {size}x{size}")
    return row * size + col


def apply_handicap(state: GoState, handicap: int, size: int) -> GoState:
    """Place handicap stones as black plays, then restore a fresh-game
    state with white to move (board.cc:109 PlaceHandicap: stones played,
    ply reset to the initial value)."""
    coords = _HANDICAPS.get(handicap, [])
    B = state.core.stones.shape[0]
    core = state.core
    for gtp in coords:
        try:
            p = _handicap_flat(gtp, size)
        except ValueError:
            continue  # off-board on small sizes
        core = core._replace(to_play=jnp.full((B,), engine.BLACK, jnp.int8))
        core, _ = engine.step_core(core, jnp.full((B,), p, jnp.int32), size)
    core = core._replace(
        to_play=jnp.full((B,), WHITE if coords else BLACK, jnp.int8),
        ply=jnp.zeros((B,), jnp.int32),
        passes=jnp.zeros((B,), jnp.int32),
        last_move=jnp.full((B,), -1, jnp.int32),
        ko_age=jnp.full((B,), 10_000, jnp.int32),
    )
    # PlaceHandicap stamps last_placed = _ply (the initial 1-based ply;
    # board.cc:1379) — feeds the history-exp df planes.
    last_placed = jnp.where(
        core.stones == engine.BLACK, 1, state.last_placed.astype(jnp.int32)
    )
    return state._replace(core=core, last_placed=last_placed)
