"""Feature-plane extraction + D4 symmetry, vectorized.

TPU-native replacement for the reference `BoardFeature`
(`/root/reference/src_cpp/elfgames/go/base/board_feature.{h,cc}`):

 - AGZ 18-plane set (`extractAGZ`): 8 x (my stones, opp stones) history
   snapshots newest-first, + black/white to-move indicators.
 - df 25-plane set (`extract`): liberty-class binaries (==1/==2/>=3) for both
   sides, simple-ko point, stone/empty masks, exp-decayed placement history,
   L1 closest-color distance transforms, to-move indicators (planes 12, 13,
   18-24 are left zero exactly as the reference leaves BORDER/POSITION_MARK
   unfilled).

D4 symmetry is applied *during* extraction with a per-board group code
(0..7 = rot + 4*flip, board_feature.h:96 `setD4Code`), as a single gather
through precomputed index maps; `transform_action` / `inv_transform_action`
are the `coord2Action` / `action2Coord` equivalents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from elf_tpu.env.go.engine import BLACK, EMPTY, WHITE, _INF, analyze_libs3
from elf_tpu.env.go.state import MAX_AGZ_HISTORY, GoState

NUM_AGZ_PLANES = 18    # board_feature.h:38 MAX_NUM_AGZ_FEATURE
NUM_DF_PLANES = 25     # board_feature.h:18 MAX_NUM_FEATURE


@functools.lru_cache(maxsize=None)
def _d4_maps(size: int):
    """Returns (fwd, inv) int32 arrays [8, N2].

    fwd[g][p]  = flat index of T_g(p)      (coord -> transformed action)
    inv[g][q]  = flat index of T_g^{-1}(q) (gather map: out[q] = in[inv[q]])
    """
    n = size
    fwd = np.zeros((8, n * n), np.int32)
    for g in range(8):
        rot, flip = g % 4, g // 4
        for r in range(n):
            for c in range(n):
                rr, cc = r, c
                for _ in range(rot):  # CCW rotation in (row, col)
                    rr, cc = n - 1 - cc, rr
                if flip:
                    rr, cc = cc, rr
                fwd[g, r * n + c] = rr * n + cc
    inv = np.zeros_like(fwd)
    for g in range(8):
        inv[g, fwd[g]] = np.arange(n * n, dtype=np.int32)
    # numpy (not jnp) so the cache never captures a tracer-scoped constant
    return fwd, inv


# The 8 group elements are pure layout ops (rot90s + transpose), so the
# per-board transform is 8 statically-transformed variants + a where-chain
# select — never a gather (generic gather lowers to a scalar loop on TPU;
# one [B, N2] gather measured 12.7 ms at B=4096 on v5e).


def _apply_d4_2d(x: jax.Array, g: int) -> jax.Array:
    """T_g on [..., N, N]: rot90^rot then transpose if flip (matches
    _d4_maps' fwd: out[T_g(p)] = in[p])."""
    rot, flip = g % 4, g // 4
    y = jnp.rot90(x, k=rot, axes=(-2, -1)) if rot else x
    return jnp.swapaxes(y, -2, -1) if flip else y


def _apply_d4_inv_2d(x: jax.Array, g: int) -> jax.Array:
    rot, flip = g % 4, g // 4
    y = jnp.swapaxes(x, -2, -1) if flip else x
    return jnp.rot90(y, k=(-rot) % 4, axes=(-2, -1)) if rot else y


def _select_d4(x2d: jax.Array, codes: jax.Array, apply) -> jax.Array:
    """Per-board D4 select over the 8 static variants ([B, ..., N, N])."""
    cond_shape = (x2d.shape[0],) + (1,) * (x2d.ndim - 1)
    out = apply(x2d, 0)
    for g in range(1, 8):
        out = jnp.where(
            (codes == g).reshape(cond_shape), apply(x2d, g), out
        )
    return out


def transform_planes(planes: jax.Array, codes: jax.Array, size: int) -> jax.Array:
    """planes [B, C, N2] -> transformed [B, C, N2] with per-board D4 code."""
    B, C, n2 = planes.shape
    x = planes.reshape(B, C, size, size)
    return _select_d4(x, codes, _apply_d4_2d).reshape(B, C, n2)


def _d4_point(r, c, g: int, n: int, inverse: bool):
    """Coordinate arithmetic for T_g / T_g^{-1} on (row, col) arrays."""
    rot, flip = g % 4, g // 4
    if inverse:
        if flip:
            r, c = c, r
        for _ in range((4 - rot) % 4):
            r, c = n - 1 - c, r
    else:
        for _ in range(rot):
            r, c = n - 1 - c, r
        if flip:
            r, c = c, r
    return r, c


def _transform_action_impl(action, codes, size: int, inverse: bool):
    n2 = size * size
    p = jnp.clip(action, 0, n2 - 1)
    r, c = p // size, p % size
    out = jnp.zeros_like(action)
    for g in range(8):
        rr, cc = _d4_point(r, c, g, size, inverse)
        out = jnp.where(codes == g, rr * size + cc, out)
    return jnp.where(action >= n2, action, out)


def transform_action(action: jax.Array, codes: jax.Array, size: int) -> jax.Array:
    """coord2Action (board_feature.h:131): board coord -> action index in the
    transformed frame.  Pass (== N2) maps to itself."""
    return _transform_action_impl(action, codes, size, inverse=False)


def inv_transform_action(action: jax.Array, codes: jax.Array, size: int) -> jax.Array:
    """action2Coord (board_feature.h:138): action in transformed frame ->
    board coord."""
    return _transform_action_impl(action, codes, size, inverse=True)


def transform_policy(pi: jax.Array, codes: jax.Array, size: int) -> jax.Array:
    """Express a board-frame policy in the transformed frame (the training
    target under augmentation: game_feature.h:107 extractMCTSPi re-indexes
    the stored policy under the batch's D4 code): out[a'] = pi[T^{-1}(a')],
    i.e. out = T(pi); pass unchanged."""
    B = pi.shape[0]
    x = pi[:, : size * size].reshape(B, size, size)
    moves = _select_d4(x, codes, _apply_d4_2d).reshape(B, size * size)
    return jnp.concatenate([moves, pi[:, size * size :]], axis=1)


def inv_transform_policy(pi: jax.Array, codes: jax.Array, size: int) -> jax.Array:
    """Map a policy over transformed actions back to board coords.

    pi [B, N2+1]; out[b, p] = pi[b, fwd[code][p]] for moves, pass unchanged.
    """
    B = pi.shape[0]
    x = pi[:, : size * size].reshape(B, size, size)
    moves = _select_d4(x, codes, _apply_d4_inv_2d).reshape(B, size * size)
    return jnp.concatenate([moves, pi[:, size * size :]], axis=1)


# ---------------------------------------------------------------------------
# AGZ 18-plane features
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2,))
def extract_agz(state: GoState, codes: jax.Array, size: int) -> jax.Array:
    """f32 [B, N, N, 18] NHWC feature planes (board_feature.cc `extractAGZ`).

    Plane 2i / 2i+1 = to-move / opponent stones, i moves ago (i=0 current);
    snapshots beyond the game length are zero.  Planes 16/17: black/white
    to-move indicator.
    """
    valid = (
        jnp.arange(MAX_AGZ_HISTORY)[None, ::-1] < state.hist_len[:, None]
    )
    return extract_agz_from_snapshots(
        state.stone_hist, valid, state.core.to_play, codes, size
    )


def extract_agz_from_snapshots(
    snaps: jax.Array,       # i8 [K, 8, n2] board snapshots, oldest first
    valid: jax.Array,       # bool [K, 8] per-snapshot validity, oldest first
    to_play: jax.Array,     # i8 [K]
    codes: jax.Array,       # i32 [K] D4 codes
    size: int,
) -> jax.Array:
    """AGZ planes from explicit snapshots — used by the in-tree MCTS leaf
    evaluation, where history is reconstructed by walking parent chains
    rather than stored per state.

    The D4 transform runs on the COMPACT int8 snapshots (8 channels)
    before the 16 boolean planes are built — ~8x less where-chain
    traffic than transforming [K, 16, n2] f32 planes, and bit-identical
    (comparisons commute with a spatial permutation)."""
    K = snaps.shape[0]
    n2 = size * size
    s2 = snaps.reshape(K, MAX_AGZ_HISTORY, size, size)
    st = _select_d4(s2, codes, _apply_d4_2d).reshape(K, MAX_AGZ_HISTORY, n2)
    planes = []
    for i in range(MAX_AGZ_HISTORY):
        snap = st[:, MAX_AGZ_HISTORY - 1 - i]  # i moves ago
        v = valid[:, MAX_AGZ_HISTORY - 1 - i][:, None]
        planes.append((snap == to_play[:, None]) & v)
        planes.append((snap == (3 - to_play)[:, None]) & v)
    stacked = jnp.stack(planes, axis=1).astype(jnp.float32)
    black_ind = jnp.broadcast_to(
        (to_play == BLACK)[:, None, None].astype(jnp.float32), (K, 1, n2)
    )
    white_ind = jnp.broadcast_to(
        (to_play == WHITE)[:, None, None].astype(jnp.float32), (K, 1, n2)
    )
    out = jnp.concatenate([stacked, black_ind, white_ind], axis=1)
    return out.reshape(K, NUM_AGZ_PLANES, size, size).transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# df 25-plane features
# ---------------------------------------------------------------------------


def _distance_transform_l1(seed_zero: jax.Array) -> jax.Array:
    """Exact L1 distance transform of [B, N, N] (0 at sources, 10000 else),
    via min-plus associative scans along rows then columns — the parallel
    equivalent of the reference's 4 sequential sweeps
    (board_feature.cc:18 `DistanceTransform`)."""

    def sweep(d, axis, reverse):
        def op(a, b):
            # composition of affine min-plus maps x -> min(v, x + w)
            va, wa = a
            vb, wb = b
            return jnp.minimum(vb, va + wb), wa + wb

        w = jnp.ones_like(d)
        v, _ = jax.lax.associative_scan(op, (d, w), axis=axis, reverse=reverse)
        return v

    d = seed_zero
    for axis in (1, 2):
        d = jnp.minimum(sweep(d, axis, False), sweep(d, axis, True))
    return d


@functools.partial(jax.jit, static_argnums=(7,))
def extract_df_parts(
    stones: jax.Array,       # i8 [B, n2]
    to_play: jax.Array,      # i8 [B]
    ko_point: jax.Array,     # i32 [B] flat idx (gated by ko_active)
    ko_active: jax.Array,    # bool [B]
    ply: jax.Array,          # i32 [B] (0-based move count)
    last_placed: jax.Array,  # i32 [B, n2] 1-based placement ply per stone
    codes: jax.Array,        # i32 [B] D4 codes
    size: int,
) -> jax.Array:
    """df 25-plane extraction from explicit parts (board_feature.cc
    `extract`) — shared by the full-state path (`extract_df`), the MCTS
    in-tree leaf evaluation (parts gathered from Tree node fields), and
    the training pipeline (parts reconstructed from record replay)."""
    B = stones.shape[0]
    n2 = size * size
    s2d = stones.reshape(B, size, size)
    player = to_play
    mine2d = s2d == player[:, None, None]
    theirs2d = (s2d != EMPTY) & ~mine2d
    empty2d = s2d == EMPTY

    lm, lx, m2 = analyze_libs3(s2d, size)
    lib1 = (lm != _INF) & (m2 == _INF)          # exactly 1 distinct liberty
    lib2 = (m2 != _INF) & (m2 == lx)            # exactly 2
    lib3 = (m2 != _INF) & (m2 < lx)             # >= 3

    ko_plane = (
        (jnp.arange(n2, dtype=jnp.int32)[None, :] == ko_point[:, None])
        & ko_active[:, None]
    ).astype(jnp.float32)

    ply_ref = (ply + 1).astype(jnp.float32)  # reference 1-based _ply
    hist_exp = jnp.exp(
        (last_placed.astype(jnp.float32) - ply_ref[:, None]) / 10.0
    ).reshape(B, size, size)

    far = jnp.full((B, size, size), 10_000.0, jnp.float32)
    dist_mine = _distance_transform_l1(jnp.where(mine2d, 0.0, far))
    dist_theirs = _distance_transform_l1(jnp.where(theirs2d, 0.0, far))

    f = lambda x: x.astype(jnp.float32).reshape(B, n2)
    zeros = jnp.zeros((B, n2), jnp.float32)
    planes = [
        f(mine2d & lib1), f(mine2d & lib2), f(mine2d & lib3),          # 0-2
        f(theirs2d & lib1), f(theirs2d & lib2), f(theirs2d & lib3),    # 3-5
        ko_plane,                                                      # 6
        f(mine2d), f(theirs2d), f(empty2d),                            # 7-9
        f(hist_exp) * f(mine2d), f(hist_exp) * f(theirs2d),            # 10-11
        zeros, zeros,                                                  # 12-13
        dist_mine.reshape(B, n2), dist_theirs.reshape(B, n2),          # 14-15
    ]
    stacked = jnp.stack(planes, axis=1)
    stacked = transform_planes(stacked, codes, size)

    black_ind = jnp.broadcast_to(
        (player == BLACK)[:, None, None].astype(jnp.float32), (B, 1, n2)
    )
    white_ind = jnp.broadcast_to(
        (player == WHITE)[:, None, None].astype(jnp.float32), (B, 1, n2)
    )
    pad = jnp.zeros((B, NUM_DF_PLANES - 18, n2), jnp.float32)  # 18-24 unused
    out = jnp.concatenate([stacked, black_ind, white_ind, pad], axis=1)
    return out.reshape(B, NUM_DF_PLANES, size, size).transpose(0, 2, 3, 1)


@functools.partial(jax.jit, static_argnums=(2,))
def extract_df(state: GoState, codes: jax.Array, size: int) -> jax.Array:
    """f32 [B, N, N, 25] NHWC df feature planes (board_feature.cc `extract`)."""
    core = state.core
    return extract_df_parts(
        core.stones, core.to_play, core.ko_point,
        (core.ko_age == 0) & (core.ko_point >= 0),
        core.ply, state.last_placed, codes, size,
    )
