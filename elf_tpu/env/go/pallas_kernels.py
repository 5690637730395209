"""Pallas TPU kernels for the Go engine's hot loop.

The engine's per-step cost is dominated by liberty analysis
(`engine.analyze_libs`): a min/max fixpoint over same-color 4-connectivity
(the TPU-native re-derivation of the reference's pointer-chasing group
lists, `/root/reference/src_cpp/elfgames/go/base/board.cc` group/liberty
bookkeeping).  As a plain XLA ``lax.while_loop`` the two i32 loop carries
round-trip HBM on every iteration (~18 MB/iter at B=4096, ~10+ iters, twice
per step) — the step is bandwidth-bound on the fixpoint.

This kernel runs the *entire* fixpoint in VMEM:

 - layout: ``[N^2, B]`` with **boards on lanes** — each of the 128 lanes
   holds an independent board, so the 4-neighbor merges are sublane rolls
   (`pltpu.roll` by ±1 / ±size) that vectorize perfectly on the (8, 128)
   VPU tiling; there is no intra-board lane traffic at all.
 - grid over lane-blocks of boards; each program converges its own block
   with an in-kernel ``lax.while_loop`` (per-block adaptive iteration
   count), touching HBM exactly once in (stones) and once out (lm, lx).

HBM traffic per call drops from O(iters * fields) to O(in + out), which is
what makes it speed-of-light: the fixpoint is pure VPU work on
VMEM-resident arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = np.int32(2**20)

# boards per program: one full lane tile wide, 2 tiles when B allows
_LANE = 128


def _dirs(size: int):
    """(delta, valid_fn) per 4-neighbor direction on the flat [N^2] axis."""
    return (
        (-size, lambda row, col: row > 0),
        (+size, lambda row, col: row < size - 1),
        (-1, lambda row, col: col > 0),
        (+1, lambda row, col: col < size - 1),
    )


def _libs_kernel(s_ref, lm_ref, lx_ref, *, size: int):
    n2 = size * size
    s = s_ref[:]                                   # [n2, BB] i32
    shape = s.shape

    p = lax.broadcasted_iota(jnp.int32, shape, 0)  # flat idx per cell
    row = p // size
    col = p % size

    empty = s == 0
    stone = ~empty

    # static per-direction data: validity mask, same-color mask, nbr index
    def roll(x, d):
        # out[p] = x[p + d] (circular; pltpu.roll wants shift >= 0)
        return pltpu.roll(x, shift=(-d) % n2, axis=0)

    dirs = []
    lm = jnp.full(shape, _INF, jnp.int32)
    lx = jnp.full(shape, -1, jnp.int32)
    for d, valid_fn in _dirs(size):
        valid = valid_fn(row, col)
        nbr_s = roll(s, d)
        same = stone & valid & (nbr_s == s)
        dirs.append((d, same))
        # init: min/max flat index of adjacent EMPTY points
        # mosaic can't rotate i1 vectors; roll the i32 stones instead
        nbr_empty = valid & (roll(s, d) == 0)
        lm = jnp.where(nbr_empty, jnp.minimum(lm, p + d), lm)
        lx = jnp.where(nbr_empty, jnp.maximum(lx, p + d), lx)
    lm = jnp.where(stone, lm, _INF)
    lx = jnp.where(stone, lx, -1)

    def one_round(lm, lx):
        for d, same in dirs:
            nlm = roll(lm, d)
            nlx = roll(lx, d)
            lm = jnp.where(same, jnp.minimum(lm, nlm), lm)
            lx = jnp.where(same, jnp.maximum(lx, nlx), lx)
        return lm, lx

    def cond(carry):
        return carry[2]

    def body(carry):
        lm, lx, _ = carry
        nlm, nlx = one_round(lm, lx)
        changed = jnp.any(nlm != lm) | jnp.any(nlx != lx)
        return nlm, nlx, changed

    lm, lx, _ = lax.while_loop(cond, body, (lm, lx, jnp.bool_(True)))
    lm_ref[:] = lm
    lx_ref[:] = lx


def _step_kernel(s_ref, act_ref, col_ref, s2_ref, lm_ref, lx_ref, cap_ref,
                 *, size: int):
    """Fused step analysis, fully VMEM-resident: tentative placement →
    min-only zero-liberty fixpoint → opponent capture removal → full
    min/max liberty fixpoint on the post-capture board.

    Replaces the two separate `analyze_libs` calls per `engine.step_core`
    (each an HBM round-trip for the board plus two i32 fields) with a
    single kernel that reads stones once and writes (s2, lm, lx, cap)
    once.  Pass moves (action >= N^2) and illegal placements behave as in
    the XLA path: pass leaves the board unchanged (the analysis is still
    produced, feeding `legal_next`); illegal rows produce garbage that the
    caller discards under its `ok_move` guard (engine.step_core commit).
    """
    n2 = size * size
    s = s_ref[:]                                    # [n2, BB] i32
    p = act_ref[:]                                  # [1, BB] i32
    col = col_ref[:]                                # [1, BB] i32
    shape = s.shape

    iota = lax.broadcasted_iota(jnp.int32, shape, 0)
    row = iota // size
    colm = iota % size

    place = (iota == p) & (p < n2)                  # [n2, BB]
    s1 = jnp.where(place, col, s)

    def roll(x, d):
        return pltpu.roll(x, shift=(-d) % n2, axis=0)

    # --- pass 1: min-only fixpoint on s1 (zero-lib detection needs only
    # lib_min == INF, so skip the max field entirely) ---------------------
    dirs1 = []
    lm1 = jnp.full(shape, _INF, jnp.int32)
    stone1 = s1 != 0
    for d, valid_fn in _dirs(size):
        valid = valid_fn(row, colm)
        nbr = roll(s1, d)
        same = stone1 & valid & (nbr == s1)
        dirs1.append((d, same))
        nbr_empty = valid & (nbr == 0)
        lm1 = jnp.where(nbr_empty, jnp.minimum(lm1, iota + d), lm1)
    lm1 = jnp.where(stone1, lm1, _INF)

    def body1(carry):
        lm, _ = carry
        nlm = lm
        for d, same in dirs1:
            nlm = jnp.where(same, jnp.minimum(nlm, roll(nlm, d)), nlm)
        return nlm, jnp.any(nlm != lm)

    lm1, _ = lax.while_loop(
        lambda c: c[1], body1, (lm1, jnp.bool_(True))
    )

    opp = 3 - col                                   # [1, BB]
    captured = (lm1 == _INF) & (s1 == opp)          # zero-lib opponent chains
    s2 = jnp.where(captured, 0, s1)

    # --- pass 2: full min/max fixpoint on the post-capture board ---------
    dirs2 = []
    lm = jnp.full(shape, _INF, jnp.int32)
    lx = jnp.full(shape, -1, jnp.int32)
    stone2 = s2 != 0
    for d, valid_fn in _dirs(size):
        valid = valid_fn(row, colm)
        nbr = roll(s2, d)
        same = stone2 & valid & (nbr == s2)
        dirs2.append((d, same))
        nbr_empty = valid & (nbr == 0)
        lm = jnp.where(nbr_empty, jnp.minimum(lm, iota + d), lm)
        lx = jnp.where(nbr_empty, jnp.maximum(lx, iota + d), lx)
    lm = jnp.where(stone2, lm, _INF)
    lx = jnp.where(stone2, lx, -1)

    def body2(carry):
        lm, lx, _ = carry
        nlm, nlx = lm, lx
        for d, same in dirs2:
            nlm = jnp.where(same, jnp.minimum(nlm, roll(nlm, d)), nlm)
            nlx = jnp.where(same, jnp.maximum(nlx, roll(nlx, d)), nlx)
        return nlm, nlx, jnp.any(nlm != lm) | jnp.any(nlx != lx)

    lm, lx, _ = lax.while_loop(
        lambda c: c[2], body2, (lm, lx, jnp.bool_(True))
    )

    s2_ref[:] = s2
    lm_ref[:] = lm
    lx_ref[:] = lx
    cap_ref[:] = captured.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(3, 4))
def step_analysis_pallas(
    stones: jax.Array, action: jax.Array, color: jax.Array,
    size: int, interpret: bool = False,
):
    """Fused placement + capture + liberty analysis for `engine.step_core`.

    stones: i8 [B, N2]; action: i32 [B] (>= N2 == pass); color: i32 [B].
    Returns (s2 i8 [B, N2], lib_min i32 [B, N, N], lib_max i32 [B, N, N],
    captured bool [B, N2]).
    """
    B = stones.shape[0]
    n2 = size * size
    bb = _LANE if (B % (2 * _LANE) != 0) else 2 * _LANE
    Bp = -(-B // bb) * bb

    s = stones.astype(jnp.int32)
    act = action.astype(jnp.int32)
    col = color.astype(jnp.int32)
    if Bp != B:
        s = jnp.pad(s, ((0, Bp - B), (0, 0)))
        act = jnp.pad(act, (0, Bp - B), constant_values=n2)  # pad lanes pass
        col = jnp.pad(col, (0, Bp - B), constant_values=1)
    s = s.T                                          # [n2, Bp]
    act = act[None, :]                               # [1, Bp]
    col = col[None, :]

    s2, lm, lx, cap = pl.pallas_call(
        functools.partial(_step_kernel, size=size),
        grid=(Bp // bb,),
        in_specs=[
            pl.BlockSpec((n2, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((n2, bb), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n2, Bp), jnp.int32) for _ in range(4)
        ),
        interpret=interpret,
    )(s, act, col)

    s2 = s2.T[:B].astype(jnp.int8)
    lm = lm.T[:B].reshape(B, size, size)
    lx = lx.T[:B].reshape(B, size, size)
    cap = cap.T[:B].astype(jnp.bool_)
    return s2, lm, lx, cap


@functools.partial(jax.jit, static_argnums=(1, 2))
def analyze_libs_pallas(stones2d: jax.Array, size: int, interpret: bool = False):
    """Pallas liberty fixpoint; drop-in for `engine.analyze_libs`.

    stones2d: i8 [B, N, N] -> (lib_min, lib_max) i32 [B, N, N].
    """
    B = stones2d.shape[0]
    n2 = size * size
    bb = _LANE if (B % (2 * _LANE) != 0) else 2 * _LANE
    Bp = -(-B // bb) * bb  # pad boards up to a whole number of lane blocks

    s = stones2d.reshape(B, n2).astype(jnp.int32)
    if Bp != B:
        s = jnp.pad(s, ((0, Bp - B), (0, 0)))
    s = s.T  # [n2, Bp]: boards on lanes

    lm, lx = pl.pallas_call(
        functools.partial(_libs_kernel, size=size),
        grid=(Bp // bb,),
        in_specs=[
            pl.BlockSpec((n2, bb), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((n2, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n2, Bp), jnp.int32),
            jax.ShapeDtypeStruct((n2, Bp), jnp.int32),
        ),
        interpret=interpret,
    )(s)

    lm = lm.T[:B].reshape(B, size, size)
    lx = lx.T[:B].reshape(B, size, size)
    return lm, lx
