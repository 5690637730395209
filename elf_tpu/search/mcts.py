"""Batched array-of-trees MCTS: the TPU-native replacement for the reference
multi-threaded tree search (`/root/reference/src_cpp/elf/ai/tree_search/
tree_search.h:327` + `elfgames/go/mcts/mcts.h`).

Where the reference runs `num_threads` C++ threads over one shared
pointer-linked tree with CAS leaf dedup, here a whole *batch* of trees lives
in `[B, num_nodes, ...]` arrays on device and every phase is a vectorized
lockstep op under jit:

  select   argmax-PUCT descent for all B trees at once (lax.while_loop over
           depth), applying virtual loss along the chosen paths
           (tree_search_node.h:233 addVirtualLoss); `rollouts_per_batch`
           leaves are selected sequentially under virtual loss
           (tree_search.h:201 batch_rollouts);
  expand   allocate one child per tree per rollout by stepping the
           vectorized Go env (lazy child alloc, tree_search_node.h:280);
  evaluate ONE fused NN forward over all B * rollouts_per_batch leaves with
           per-leaf random D4 symmetry (mcts.h:175 `get_extractor`) and the
           terminal TT shortcut (mcts.h pre_evaluate: value = sign(score));
  backprop add visit counts / values along parent chains
           (tree_search_node.h:253 updateEdgeStats).

Memory layout (HBM is the constraint at the production operating point of
>=1024 boards x 1600 rollouts):

 - Edge statistics live on the CHILD NODE, not on [B, N, A] edge arrays: a
   visited edge always has an allocated child (lazy alloc happens on first
   traversal), so `n/w/vl` are [B, N] node fields and an edge without a
   child implicitly has n = w = vl = 0.  This removes three of the five
   O(N*A) arrays the naive edge layout needs.
 - `prior` is bfloat16 (the reference itself ships policies 8-bit quantized
   on the wire, go_state_ext.h:172) and doubles as the legality mask:
   illegal actions store -1; legal-but-unevaluated nodes store 0.
 - `child` is int16 (node ids < 32768), core scalars are i8/i16.

Net: ~1.85 KB/node vs ~8 KB for the edge layout — 1024 trees x 1600
rollouts x 2x reuse capacity fits in ~6 GB of HBM.

Semantics parity with the reference (validated rollout-for-rollout against
the reference's own compiled NodeT machinery — tests/test_golden_mcts.py):
 - values are stored from BLACK's perspective; selection flips Q for white
   (tree_search_base.h:132 getScore q_flip).
 - PUCT score = Q + c_puct * prior * sqrt(sum_n + 1) / (1 + n); virtual
   loss affects only the Q term ((±w - vl) / (n + vl)), never the
   exploration term (getScore uses raw num_visits).
 - first-play urgency: an unexplored edge's Q defaults to ±unsignedMeanQ,
   the node's running mean unsigned Q seeded from its parent at
   allocation and refreshed on every selection visit
   (tree_search_node.h:227; Tree.umean_q / Tree.uparent_q).
 - duplicate leaves within a virtual-loss batch backprop once, removing
   all their virtual losses (batch_rollouts traj_counts, tree_search.h:255).
 - Dirichlet root noise via gamma draws, eps-mixed into the root prior
   (tree_search_node.h:132 enhanceExploration).
 - pass is masked from priors until ply >= ply_pass_enabled and when passing
   now would lose on the TT count — unless the position was itself reached
   by a pass (mcts.h:232 remove_pass_if_dangerous).
 - per-player options (white_puct, white_num_rollouts) apply to the whole
   search of the white-model-rooted board; player_swap flips the keying
   (white_opts_on_black).
 - a re-selected not-yet-evaluated leaf is re-evaluated rather than
   duplicated (the array analog of requestEvaluation/waitEvaluation dedup).

In-tree positional superko IS checked: nodes carry positional hashes, and
an expansion whose stone move recreates a path-ancestor or game-history
position becomes a terminal node scored for the player to move
(go_state.h:194), matching the reference's full-GoState-clone behavior
without storing histories per node.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from elf_tpu.env.go import engine
from elf_tpu.env.go.engine import BLACK, GoCore
from elf_tpu.env.go.features import (
    extract_agz_from_snapshots,
    inv_transform_policy,
)

# numpy scalar, NOT jnp: a module-level jnp constant would initialize the
# XLA backend at import time, breaking jax.distributed.initialize in any
# process that imports the search module first (train_server.py --dist_*)
NEG_INF = np.float32(-1e9)
_KO_INACTIVE = np.int16(10_000)


@dataclasses.dataclass(frozen=True)
class MCTSConfig:
    num_rollouts: int = 200
    rollouts_per_batch: int = 8
    c_puct: float = 1.5
    virtual_loss: int = 1
    root_epsilon: float = 0.0
    root_alpha: float = 0.03
    max_depth: int = 128
    komi: float = 7.5
    ply_pass_enabled: int = 0
    remove_pass_if_dangerous: bool = True
    rotation_flip: bool = True  # random D4 symmetry per NN evaluation
    # action ranking: most_visited | prior | uniform_random
    # (tree_search_base.h:213 MCTSResultT RankCriterion)
    pick_method: str = "most_visited"
    # asymmetric exploration for the white mover (go_game_specific.h:89
    # white_puct; -1 = same as c_puct) — used by eval games.  Applied to
    # the whole search of a white-rooted board (the reference builds the
    # white player's AI with its own TSOptions, game_selfplay.cc:173).
    white_puct: float = -1.0
    # per-player rollout budget for the white mover
    # (white_mcts_rollout_per_thread x num_threads, go_game_specific.h:90;
    # 0 = same as num_rollouts).  White-rooted boards stop simulating
    # after their budget; the lockstep batch still runs to the larger
    # budget with finished boards masked.  (The reference's per-player
    # rollouts-per-NN-batch knob has no lockstep analog: m is shared.)
    white_num_rollouts: int = 0
    # player_swap moves the white-options AI onto BLACK for eval halves
    # (game_selfplay.cc:182 swap(_ai, _ai2)): when True the white_* knobs
    # apply to black-rooted boards instead
    white_opts_on_black: bool = False
    # PUCT exploration term on/off (SearchAlgoOptions.use_prior,
    # tree_search_options.h:24; scoring at tree_search_node.h:379:
    # score = q only when off)
    use_prior: bool = True
    # first-play urgency: an unexplored edge's Q defaults to the node's
    # running mean unsigned Q seeded from its parent (tree_search_base.h:148
    # unsigned_default_q + tree_search_node.h:227 unsignedMeanQ_ update);
    # these flags zero that default instead (SearchAlgoOptions
    # unexplored_q_zero / root_unexplored_q_zero, tree_search_options.h:26,
    # both false in the reference's production configs)
    unexplored_q_zero: bool = False
    root_unexplored_q_zero: bool = False
    # tree capacity override (TSOptions max_num_moves-adjacent knob the
    # reference exposes as --mcts_max_nodes); 0 = num_rollouts + 2
    max_nodes: int = 0
    # cap the fused leaf-eval NN batch: when rollouts_per_batch * B
    # exceeds this, leaves are evaluated in sequential chunks (lax.map)
    # so peak activation memory stays bounded at production shapes
    # (B=1024 x m=8 = 8192-leaf forwards otherwise).  0 = no cap.
    eval_chunk: int = 0
    # cap the simulation batches folded into ONE device execution: a
    # prod-shape search (200 sequential NN sweeps) as a single XLA
    # program runs minutes on-device, which TPU runtimes may kill as a
    # hung worker; the actor loops `mcts_simulate` from the host in
    # chunks of this many sim-batches instead (tree donated between
    # calls, so no copies).  0 = whole search in one call.
    max_batches_per_call: int = 0
    # leaf feature set: "agz" (18 planes from 8 history snapshots) or
    # "df" (25 planes: liberties/ko/placement-history,
    # board_feature.h:18-37).  df leaves reconstruct per-point placement
    # plies by walking the parent chain from the game state's
    # last_placed (the reference clones a full GoState per node instead)
    feature_set: str = "agz"
    # defer the per-rollout big-array writes (child pointers / stones
    # rows / pre-priors) to one flush per simulation batch: an ~8x
    # HBM-traffic saving when the [B, N, A] arrays are large (every
    # scatter lowers to a full-array pass), but pure overhead for small
    # trees, where the overlay bookkeeping dominates (the B=16 play
    # config regressed 12% when it was unconditional).  "auto" enables
    # it when B * N * A >= 2^24; "on"/"off" force (golden tests pin
    # both paths).
    batched_writes: str = "auto"

    @property
    def num_nodes(self) -> int:
        if self.max_nodes > 0:
            return self.max_nodes
        return max(self.num_rollouts, self.white_num_rollouts) + 2


class Tree(NamedTuple):
    """[B, N(, ...)] arrays; node 0 is the root.

    Edge stats are stored on the child node: for an edge (p, a) with child
    c, n_edge(p, a) == n[c], w_edge(p, a) == w[c], vl_edge(p, a) == vl[c];
    edges with child[p, a] == -1 have zero stats by construction."""

    # env core per node (compact dtypes; widened on gather)
    stones: jax.Array       # i8  [B, N, n2]
    to_play: jax.Array      # i8  [B, N]
    ko_point: jax.Array     # i16 [B, N]
    ko_color: jax.Array     # i8  [B, N]
    ko_age: jax.Array       # i16 [B, N]
    ply: jax.Array          # i16 [B, N]
    passes: jax.Array       # i8  [B, N]
    hash_lo: jax.Array      # u32 [B, N]  positional hash (in-tree superko)
    hash_hi: jax.Array      # u32 [B, N]
    # search stats
    prior: jax.Array        # bf16 [B, N, A]  (-1 illegal; 0 pending-legal)
    child: jax.Array        # i16  [B, N, A]  child node id or -1
    n: jax.Array            # i32 [B, N]  visits through the incoming edge
    w: jax.Array            # f32 [B, N]  black-persp. value sum (incoming edge)
    vl: jax.Array           # i32 [B, N]  virtual-loss count (incoming edge)
    parent: jax.Array       # i16 [B, N]
    parent_a: jax.Array     # i16 [B, N]
    expanded: jax.Array     # bool [B, N]
    terminal: jax.Array     # bool [B, N]
    value: jax.Array        # f32 [B, N]      NN/terminal value (black persp.)
    superko: jax.Array      # bool [B, N]     terminal by in-tree repetition
    # first-play-urgency state (tree_search_node.h:313-317): the node's
    # running mean unsigned Q (updated at every selection visit) and the
    # parent's mean at allocation time (const per node)
    umean_q: jax.Array      # f32 [B, N]
    uparent_q: jax.Array    # f32 [B, N]
    count: jax.Array        # i32 [B]         allocated nodes
    # the root's un-noised prior: Dirichlet re-mixes on reused roots blend
    # into THIS, never into an already-noised prior
    root_raw_prior: jax.Array  # f32 [B, A]

    # -- debug/test views (NOT hot-path): reconstruct the [B, N, A] edge
    # arrays the naive layout would store ---------------------------------
    def _edge_view(self, node_arr, fill):
        child = self.child.astype(jnp.int32)
        cs = jnp.clip(child, 0, node_arr.shape[1] - 1)
        rows = jnp.arange(node_arr.shape[0])[:, None, None]
        return jnp.where(child >= 0, node_arr[rows, cs], fill)

    @property
    def n_edge(self):
        return self._edge_view(self.n, 0)

    @property
    def w_edge(self):
        return self._edge_view(self.w, 0.0)

    @property
    def vl_edge(self):
        return self._edge_view(self.vl, 0)


class MCTSResult(NamedTuple):
    mcts_policy: jax.Array   # f32 [B, A] normalized root visit distribution
    best_action: jax.Array   # i32 [B]    most-visited root action
    root_value: jax.Array    # f32 [B]    NN value at root (black perspective)
    root_q: jax.Array        # f32 [B]    visit-weighted root Q (black persp.)


# eval_fn(features [M, N, N, C], to_play [M]) -> (log_pi [M, A], value [M])
# (to_play lets two-model evaluators route each leaf to the mover's net,
# the eval-game path: ctrl_eval.h candidate-vs-baseline with player_swap)
EvalFn = Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]


def _init_tree(B: int, size: int, cfg: MCTSConfig) -> Tree:
    return _make_tree(B, size, cfg.num_nodes)


def _make_tree(B: int, size: int, N: int) -> Tree:
    n2 = size * size
    A = n2 + 1
    # node ids are int16; a full tree falls back to re-evaluating the
    # frontier node (see _select_and_expand capacity guard), so clamping
    # the capacity is safe — it only bounds subtree reuse at extreme
    # rollout counts (e.g. gtp.sh's 2 * 16384 + 2 reuse capacity)
    N = min(N, 32767)
    zi8 = lambda *s: jnp.zeros(s, jnp.int8)
    zi16 = lambda *s: jnp.zeros(s, jnp.int16)
    zi32 = lambda *s: jnp.zeros(s, jnp.int32)
    zf32 = lambda *s: jnp.zeros(s, jnp.float32)
    return Tree(
        stones=zi8(B, N, n2),
        to_play=zi8(B, N),
        ko_point=jnp.full((B, N), -1, jnp.int16),
        ko_color=zi8(B, N),
        ko_age=jnp.full((B, N), _KO_INACTIVE, jnp.int16),
        ply=zi16(B, N),
        passes=zi8(B, N),
        hash_lo=jnp.zeros((B, N), jnp.uint32),
        hash_hi=jnp.zeros((B, N), jnp.uint32),
        prior=jnp.full((B, N, A), -1.0, jnp.bfloat16),
        child=jnp.full((B, N, A), -1, jnp.int16),
        n=zi32(B, N),
        w=zf32(B, N),
        vl=zi32(B, N),
        parent=jnp.full((B, N), -1, jnp.int16),
        parent_a=jnp.full((B, N), -1, jnp.int16),
        expanded=jnp.zeros((B, N), jnp.bool_),
        terminal=jnp.zeros((B, N), jnp.bool_),
        value=zf32(B, N),
        superko=jnp.zeros((B, N), jnp.bool_),
        umean_q=zf32(B, N),
        uparent_q=zf32(B, N),
        count=jnp.ones((B,), jnp.int32),  # root pre-allocated
        root_raw_prior=jnp.full((B, A), -1.0, jnp.float32),
    )


def _core_at(tree: Tree, rows: jax.Array, node: jax.Array, size: int) -> GoCore:
    """Gather a GoCore batch for node ids `node` on tree rows `rows`
    (both [K]-shaped; rows may repeat for multi-leaf gathers).  Compact
    tree dtypes are widened back to the engine's."""
    K = node.shape[0]
    g = lambda a: a[rows, node]
    return GoCore(
        stones=g(tree.stones),
        to_play=g(tree.to_play),
        ko_point=g(tree.ko_point).astype(jnp.int32),
        ko_color=g(tree.ko_color),
        ko_age=g(tree.ko_age).astype(jnp.int32),
        ply=g(tree.ply).astype(jnp.int32),
        passes=g(tree.passes).astype(jnp.int32),
        last_move=jnp.full((K,), -1, jnp.int32),
        hash_lo=g(tree.hash_lo),
        hash_hi=g(tree.hash_hi),
    )


def _write_core(tree: Tree, node: jax.Array, core: GoCore, mask: jax.Array,
                skip_stones: bool = False) -> Tree:
    B = node.shape[0]
    rows = jnp.arange(B)
    node = jnp.clip(node, 0, tree.stones.shape[1] - 1)

    def w(arr, val):
        val = val.astype(arr.dtype)
        return arr.at[rows, node].set(
            jnp.where(mask.reshape((B,) + (1,) * (val.ndim - 1)), val, arr[rows, node])
        )

    return tree._replace(
        stones=tree.stones if skip_stones else w(tree.stones, core.stones),
        to_play=w(tree.to_play, core.to_play),
        ko_point=w(tree.ko_point, core.ko_point),
        ko_color=w(tree.ko_color, core.ko_color),
        ko_age=w(tree.ko_age, jnp.minimum(core.ko_age, jnp.int32(_KO_INACTIVE))),
        ply=w(tree.ply, core.ply),
        passes=w(tree.passes, core.passes),
        hash_lo=w(tree.hash_lo, core.hash_lo),
        hash_hi=w(tree.hash_hi, core.hash_hi),
    )


def _edge_stats(tree: Tree, node: jax.Array):
    """Per-action (n, w, vl) at `node` [B] -> three f32/i32 [B, A] arrays,
    gathered from the child nodes (zero where no child exists).

    On big trees the double-indirection gather (child id -> per-node
    stats) lowers to a scalar-core loop on TPU (~17 ms per select step at
    B=1024, N=1602 — profiled); a one-hot MXU contraction streams the
    same lookup through the matrix unit instead.  The contraction is
    BIT-EXACT: each output row sums exactly one nonzero product (the 0/1
    one-hot times an f32 stat), so no rounding ever occurs and golden
    visit parity is preserved."""
    B = node.shape[0]
    N = tree.n.shape[1]
    A = tree.child.shape[2]
    rows = jnp.arange(B)
    child = tree.child[rows, node].astype(jnp.int32)      # [B, A]
    has = child >= 0
    cs = jnp.clip(child, 0, N - 1)

    if B * A * N >= (1 << 24):
        # bf16 one-hot MXU contraction, EXACT by construction: every
        # output row sums exactly one nonzero product, int stats are
        # split base-256 into bf16-exact digits, and w is decomposed
        # into three bf16 residuals (8+8+8 mantissa bits = f32's 24).
        # The residuals are computed with lax.reduce_precision — a
        # convert round-trip would be folded away by XLA's
        # excess-precision pass, silently zeroing the low pieces.
        # Halving the materialized one-hot (vs f32) makes this the
        # cheapest exact form measured (2.43 -> 1.86 ms at prod shapes);
        # this op dominates tree overhead at B=1024.
        bf = jnp.bfloat16
        rp = lambda x: lax.reduce_precision(x, exponent_bits=8,
                                            mantissa_bits=7)
        onehot = (
            (cs[:, :, None] == jnp.arange(N, dtype=jnp.int32)[None, None, :])
            & has[:, :, None]
        ).astype(bf)                                       # [B, A, N]
        w1 = rp(tree.w)
        r1 = tree.w - w1
        w2 = rp(r1)
        w3 = rp(r1 - w2)
        # n gets THREE base-256 digits: reused trees accumulate visits
        # across moves, so n is bounded by 2^24 (f32-exactness bound the
        # f32 path had), not by one search's rollout count
        pieces = jnp.stack(
            [
                (tree.n // 65536).astype(bf),
                ((tree.n // 256) % 256).astype(bf),
                (tree.n % 256).astype(bf),
                w1.astype(bf), w2.astype(bf), w3.astype(bf),
                (tree.vl // 256).astype(bf),
                (tree.vl % 256).astype(bf),
            ],
            axis=-1,
        )                                                  # [B, N, 8]
        out = jax.lax.dot_general(
            onehot, pieces,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                  # [B, A, 8]
        n = jnp.round(
            (out[..., 0] * 256 + out[..., 1]) * 256 + out[..., 2]
        ).astype(jnp.int32)
        w = out[..., 3] + out[..., 4] + out[..., 5]
        vl = jnp.round(out[..., 6] * 256 + out[..., 7]).astype(jnp.int32)
        return n, w, vl

    r2 = rows[:, None]
    n = jnp.where(has, tree.n[r2, cs], 0)
    w = jnp.where(has, tree.w[r2, cs], 0.0)
    vl = jnp.where(has, tree.vl[r2, cs], 0)
    return n, w, vl


def _puct_scores(tree: Tree, node: jax.Array, cfg: MCTSConfig,
                 is_root: jax.Array, overlay=None):
    """Selection scores at `node`, exactly as the reference computes them
    (tree_search_node.h:360 UCT + tree_search_base.h:132 getScore):

      q  = (±w - vl) / (n + vl)            for edges with n + vl > 0
      q  = ±unsignedMeanQ                  for unexplored edges (FPU)
      u  = c_puct * prior * sqrt(Σn + 1) / (1 + n)   [virtual loss does
           NOT enter the exploration term — only raw completed visits]

    Returns (scores [B, A], new_umean [B]): the node's updated running
    mean unsigned Q, which the caller must store (findMove's
    `unsignedMeanQ_ = (unsignedParentQ_ + Σ unsigned_q) / (visited + 1)`,
    tree_search_node.h:227).  `is_root` [B] (or scalar) bool enables
    root_unexplored_q_zero."""
    B = node.shape[0]
    A = tree.prior.shape[2]
    rows = jnp.arange(B)
    prior = tree.prior[rows, node].astype(jnp.float32)   # [B, A]
    n_i, w, vl_i = _edge_stats(tree, node)
    n_i, w, vl_i = _overlay_stat_fix(tree, overlay, node, rows, A,
                                     n_i, w, vl_i)
    n = n_i.astype(jnp.float32)
    vl = vl_i.astype(jnp.float32)
    legal = prior >= 0.0

    to_play = tree.to_play[rows, node]
    sign = jnp.where(to_play == BLACK, 1.0, -1.0)[:, None]

    # FPU default (possibly zeroed by option, findMove tree_search_node.h:220)
    umean = tree.umean_q[rows, node]
    if cfg.unexplored_q_zero:
        umean = jnp.zeros_like(umean)
    elif cfg.root_unexplored_q_zero:
        umean = jnp.where(jnp.broadcast_to(is_root, umean.shape),
                          0.0, umean)
    umean2 = umean[:, None]

    # virtual loss counts as vl extra visits of value -1 for the mover
    n_eff = n + vl
    w_eff = w * sign - vl
    q = jnp.where(
        n_eff > 0, w_eff / jnp.maximum(n_eff, 1.0), sign * umean2
    )

    # running-mean update: per-edge unsigned q (raw w/n, no flip) for
    # edges with n + vl > 0; vl-only edges contribute the default
    visited = legal & (n_eff > 0)
    uq = jnp.where(n > 0, w / jnp.maximum(n, 1.0), umean2)
    new_umean = (
        tree.uparent_q[rows, node]
        + jnp.sum(jnp.where(visited, uq, 0.0), axis=1)
    ) / (jnp.sum(visited, axis=1).astype(jnp.float32) + 1.0)

    if not cfg.use_prior:
        # tree_search_node.h:379: score = q alone when use_prior is off
        return jnp.where(legal, q, NEG_INF), new_umean
    total = jnp.sum(n, axis=1, keepdims=True)
    c = cfg.c_puct
    if cfg.white_puct > 0:
        # per-PLAYER option: the white-options AI runs its whole search
        # with white_puct (game_selfplay.cc:177 init_ai builds the white
        # MCTSAI with its own TSOptions) — keyed off the ROOT's player,
        # constant throughout the tree, not per node; white_opts_on_black
        # flips the keying for player-swapped eval halves
        root_player = tree.to_play[:, 0]
        opts_player = BLACK if cfg.white_opts_on_black else engine.WHITE
        c = jnp.where(root_player == opts_player, cfg.white_puct,
                      cfg.c_puct)[:, None]
    u = c * jnp.maximum(prior, 0.0) * jnp.sqrt(total + 1.0) / (1.0 + n)
    return jnp.where(legal, q + u, NEG_INF), new_umean


def _hash_in_ancestors(tree: Tree, node: jax.Array, h_lo: jax.Array,
                       h_hi: jax.Array) -> jax.Array:
    """bool [B]: does (h_lo, h_hi) equal any position hash on the path
    node -> root?  (In-tree positional-superko detection.)"""
    B = node.shape[0]
    rows = jnp.arange(B)

    def cond(carry):
        _, active = carry
        return jnp.any(active)

    def body(carry):
        (cur, found), active = carry
        safe = jnp.clip(cur, 0, tree.stones.shape[1] - 1)
        hit = active & (tree.hash_lo[rows, safe] == h_lo) & (
            tree.hash_hi[rows, safe] == h_hi
        )
        found = found | hit
        parent = tree.parent[rows, safe].astype(jnp.int32)
        active = active & (parent >= 0)
        cur = jnp.where(active, parent, cur)
        return (cur, found), active

    (_, found), _ = lax.while_loop(
        cond, body,
        ((node, jnp.zeros((B,), jnp.bool_)), jnp.ones((B,), jnp.bool_)),
    )
    return found


class _Overlay(NamedTuple):
    """In-flight edges of the current simulation batch whose big-array
    writes (child pointers, stones rows, pre-priors) are deferred to one
    flush per batch: per-rollout scatters into the [B, N, A] / [B, N, n2]
    arrays lower to full-array select passes on TPU (~4 ms each over the
    1.19 GB child array), so batching them is an ~8x traffic saving.
    Selection consults the overlay so in-batch visibility is EXACTLY the
    immediate-write semantics (golden m=8 parity holds)."""

    node: jax.Array    # i32 [m, B] parent node of the new edge (-1 empty)
    a: jax.Array       # i32 [m, B] action of the new edge
    child: jax.Array   # i32 [m, B] allocated child id


def _overlay_child_lookup(overlay, cur, a, child):
    """Child pointer for (cur, a) including not-yet-flushed edges."""
    if overlay is None:
        return child
    hit = (
        (overlay.node == cur[None, :])
        & (overlay.a == a[None, :])
        & (overlay.node >= 0)
    )                                                     # [m, B]
    ov = jnp.sum(jnp.where(hit, overlay.child, 0), axis=0)
    return jnp.where(jnp.any(hit, axis=0), ov, child)


def _overlay_stat_fix(tree, overlay, cur, rows, A, n, w, vl):
    """Add the stats of overlay edges at `cur` into the per-action stat
    rows (their child ids are not in tree.child yet, but their node-
    resident n/w/vl ARE current — allocation virtual loss included).
    One vectorized scatter-add per stat over all m overlay slots
    (non-hit lanes are redirected out of bounds and dropped)."""
    if overlay is None:
        return n, w, vl
    N = tree.n.shape[1]
    m, B = overlay.node.shape
    hit = (overlay.node == cur[None, :]) & (overlay.node >= 0)    # [m, B]
    cj = jnp.clip(overlay.child, 0, N - 1)                        # [m, B]
    rows_f = jnp.broadcast_to(rows[None, :], (m, B))
    aj = jnp.where(hit, jnp.clip(overlay.a, 0, A - 1), A)
    n = n.at[rows_f, aj].add(
        jnp.where(hit, tree.n[rows_f, cj], 0), mode="drop"
    )
    w = w.at[rows_f, aj].add(
        jnp.where(hit, tree.w[rows_f, cj], 0.0), mode="drop"
    )
    vl = vl.at[rows_f, aj].add(
        jnp.where(hit, tree.vl[rows_f, cj], 0), mode="drop"
    )
    return n, w, vl


class _FlushRec(NamedTuple):
    """One rollout's deferred big-array writes."""

    valid: jax.Array       # bool [B] expansion happened
    new_id: jax.Array      # i32 [B]
    stones_row: jax.Array  # i8 [B, n2]
    prior_row: jax.Array   # bf16 [B, A]
    edge_node: jax.Array   # i32 [B]
    edge_a: jax.Array      # i32 [B]


def _select_and_expand(tree: Tree, cfg: MCTSConfig, size: int,
                       game_hh_lo=None, game_hh_hi=None, game_nhash=None,
                       active=None, overlay=None):
    """One rollout's select+expand for all B trees.  Returns
    (tree, leaf_id, flush_rec).

    leaf_id: newly allocated node (pending eval), an existing pending node,
    an existing terminal node, or the root for terminal/degenerate roots.
    `active` [B] (optional): boards with False neither select nor expand
    (their leaf is the root, which backprop ignores).
    `overlay` (optional): in-batch edges whose big-array writes are still
    pending — when given, this rollout's own big-array writes are ALSO
    deferred and returned in flush_rec (else they are applied directly
    and flush_rec is None)."""
    B = tree.stones.shape[0]
    rows = jnp.arange(B)
    A = size * size + 1

    def cond(carry):
        _, _, _, done, depth = carry
        return (~jnp.all(done)) & (depth < cfg.max_depth)

    def body(carry):
        tree, cur, leaf, done, depth = carry
        scores, new_umean = _puct_scores(tree, cur, cfg, depth == 0,
                                         overlay=overlay)
        a = jnp.argmax(scores, axis=1).astype(jnp.int32)
        # findMove updates the node's running mean unsigned Q on every
        # selection visit (tree_search_node.h:227)
        tree = tree._replace(
            umean_q=tree.umean_q.at[rows, cur].set(
                jnp.where(~done, new_umean, tree.umean_q[rows, cur])
            )
        )
        child = tree.child[rows, cur, a].astype(jnp.int32)
        child = _overlay_child_lookup(overlay, cur, a, child)
        has_child = child >= 0
        safe_child = jnp.clip(child, 0, tree.stones.shape[1] - 1)
        # virtual loss on the traversed edge = on the child node (the
        # expansion edge's vl is applied at allocation time instead)
        tree = tree._replace(
            vl=tree.vl.at[rows, safe_child].add(
                jnp.where(~done & has_child, cfg.virtual_loss, 0)
            )
        )
        child_pending = has_child & ~tree.expanded[rows, safe_child] \
            & ~tree.terminal[rows, safe_child]
        child_terminal = has_child & tree.terminal[rows, safe_child]

        stop_expand = ~done & ~has_child
        stop_leaf = ~done & (child_pending | child_terminal)

        leaf = jnp.where(stop_leaf, child, leaf)
        # encode the expansion edge (cur, a) as -(cur*A + a) - 2
        enc = -(cur * A + a) - 2
        leaf = jnp.where(stop_expand, enc, leaf)
        done = done | stop_expand | stop_leaf
        cur = jnp.where(done, cur, safe_child)
        return tree, cur, leaf, done, depth + 1

    cur0 = jnp.zeros((B,), jnp.int32)
    leaf0 = jnp.zeros((B,), jnp.int32)  # fallback: root (re-eval)
    done0 = tree.terminal[:, 0]         # terminal roots: nothing to select
    if active is not None:
        done0 = done0 | ~active
    tree, cur, leaf, done, _ = lax.while_loop(
        cond, body, (tree, cur0, leaf0, done0, jnp.int32(0))
    )
    # depth-cap hit: treat the current node as leaf (re-evaluate it)
    leaf = jnp.where(~done, cur, leaf)

    # --- expansion: decode (node, action), step env, allocate --------------
    # (capacity guard: a full tree re-evaluates the frontier node instead
    # of allocating — only reachable with reused trees)
    need_expand = (leaf < -1) & (tree.count < tree.stones.shape[1])
    frontier = (leaf < -1) & ~need_expand
    enc = jnp.where(leaf < -1, -(leaf + 2), 0)
    exp_node = enc // A
    exp_a = enc % A

    core = _core_at(tree, rows, exp_node, size)
    child_core, step_info = engine.step_core(core, exp_a, size)
    new_id = jnp.where(need_expand, tree.count, 0)
    new_id = jnp.clip(new_id, 0, tree.stones.shape[1] - 1)

    if overlay is None:
        tree = _write_core(tree, new_id, child_core, need_expand)
    else:
        # defer the big stones row; write the small per-node core fields
        # directly (parents of in-batch expansions always predate the
        # batch — pending nodes are never descended into — so nothing in
        # this batch reads a deferred stones row before the flush)
        tree = _write_core(tree, new_id, child_core, need_expand,
                           skip_stones=True)

    # in-tree positional superko (go_state.cc:96 semantics carried into the
    # search): a stone move recreating a path-ancestor or game-history
    # position terminates, scored for the player to move (go_state.h:194).
    is_stone_move = exp_a < size * size
    rep = _hash_in_ancestors(tree, exp_node, child_core.hash_lo,
                             child_core.hash_hi)
    if game_hh_lo is not None:
        k = jnp.arange(game_hh_lo.shape[1])[None, :]
        in_game = (
            (game_hh_lo == child_core.hash_lo[:, None])
            & (game_hh_hi == child_core.hash_hi[:, None])
            & (k < game_nhash[:, None])
        ).any(axis=1)
        rep = rep | in_game
    rep = rep & is_stone_move & need_expand
    superko_value = jnp.where(child_core.to_play == BLACK, 1.0, -1.0)

    term = engine.is_terminal_core(child_core, size) | rep
    # pre-prior: legality of the child position, encoded in the prior sign
    # ({0, -1}; overwritten with the real prior at evaluation time)
    pre_prior = jnp.where(step_info.legal_next, 0.0, -1.0).astype(jnp.bfloat16)
    tree = tree._replace(
        superko=tree.superko.at[rows, new_id].set(
            jnp.where(need_expand, rep, tree.superko[rows, new_id])
        ),
        value=tree.value.at[rows, new_id].set(
            jnp.where(rep, superko_value, tree.value[rows, new_id])
        ),
    )
    if overlay is None:
        tree = tree._replace(
            prior=tree.prior.at[rows, new_id].set(
                jnp.where(need_expand[:, None], pre_prior,
                          tree.prior[rows, new_id])
            ),
            child=tree.child.at[rows, exp_node, exp_a].set(
                jnp.where(need_expand, new_id,
                          tree.child[rows, exp_node, exp_a].astype(jnp.int32)
                          ).astype(jnp.int16)
            ),
        )
    tree = tree._replace(
        parent=tree.parent.at[rows, new_id].set(
            jnp.where(need_expand, exp_node,
                      tree.parent[rows, new_id].astype(jnp.int32)
                      ).astype(jnp.int16)
        ),
        parent_a=tree.parent_a.at[rows, new_id].set(
            jnp.where(need_expand, exp_a,
                      tree.parent_a[rows, new_id].astype(jnp.int32)
                      ).astype(jnp.int16)
        ),
        terminal=tree.terminal.at[rows, new_id].set(
            jnp.where(need_expand, term, tree.terminal[rows, new_id])
        ),
        # fresh stats + the expansion edge's virtual loss
        n=tree.n.at[rows, new_id].set(
            jnp.where(need_expand, 0, tree.n[rows, new_id])
        ),
        w=tree.w.at[rows, new_id].set(
            jnp.where(need_expand, 0.0, tree.w[rows, new_id])
        ),
        vl=tree.vl.at[rows, new_id].set(
            jnp.where(need_expand, cfg.virtual_loss, tree.vl[rows, new_id])
        ),
        # the child inherits the parent's (just-updated) mean unsigned Q
        # as its FPU seed (followEdge: tree.addNode(unsignedMeanQ_),
        # tree_search_node.h:298)
        umean_q=tree.umean_q.at[rows, new_id].set(
            jnp.where(need_expand, tree.umean_q[rows, exp_node],
                      tree.umean_q[rows, new_id])
        ),
        uparent_q=tree.uparent_q.at[rows, new_id].set(
            jnp.where(need_expand, tree.umean_q[rows, exp_node],
                      tree.uparent_q[rows, new_id])
        ),
        count=tree.count + need_expand.astype(jnp.int32),
    )
    leaf = jnp.where(need_expand, new_id, leaf)
    # full tree: fall back to re-evaluating the node whose edge we hit
    leaf = jnp.where(frontier, exp_node, leaf)
    if overlay is None:
        return tree, leaf, None
    flush = _FlushRec(
        valid=need_expand,
        new_id=new_id,
        stones_row=child_core.stones.astype(jnp.int8),
        prior_row=pre_prior,
        edge_node=exp_node,
        edge_a=exp_a,
    )
    return tree, leaf, flush


def _leaf_snapshots(tree: Tree, rows: jax.Array, leaf: jax.Array,
                    root_hist: jax.Array, root_hist_len: jax.Array, size: int):
    """8 board snapshots ending at `leaf` (oldest first), walking parent
    chains and extending into the game history below the root.

    root_hist [B, 8, n2] game snapshots oldest-first (root_hist[:, 7] is the
    root board); root_hist_len counts its valid entries.  rows/leaf are [K]
    (rows may repeat).  Returns (snaps [K, 8, n2], valid [K, 8]) both
    oldest-first.  A snapshot is valid iff it is a post-move board
    (go_state history semantics: the initial board is never an entry)."""
    H = root_hist.shape[1]

    snaps_newest_first = []
    valid_newest_first = []
    cur = leaf
    in_tree = jnp.ones_like(leaf, dtype=jnp.bool_)
    k = jnp.zeros_like(leaf)  # moves before the root (valid once out of tree)
    for _ in range(H):
        safe = jnp.clip(cur, 0, tree.stones.shape[1] - 1)
        from_tree = tree.stones[rows, safe]
        hist_idx = jnp.clip(H - 1 - k, 0, H - 1)
        from_hist = root_hist[rows, hist_idx]
        snaps_newest_first.append(
            jnp.where(in_tree[:, None], from_tree, from_hist)
        )
        node_is_postmove = tree.ply[rows, safe] > 0
        valid_newest_first.append(
            jnp.where(in_tree, node_is_postmove, k < root_hist_len[rows])
        )
        parent = tree.parent[rows, safe].astype(jnp.int32)
        exiting = in_tree & (parent < 0)  # cur is the root
        k = jnp.where(in_tree, jnp.where(exiting, 1, 0), k + 1)
        cur = jnp.where(in_tree & ~exiting, parent, cur)
        in_tree = in_tree & ~exiting

    snaps = jnp.stack(snaps_newest_first[::-1], axis=1)
    valid = jnp.stack(valid_newest_first[::-1], axis=1)
    return snaps, valid


def _leaf_last_placed(tree: Tree, rows: jax.Array, leaf: jax.Array,
                      root_lp: jax.Array, size: int) -> jax.Array:
    """i32 [K, n2]: per-point 1-based placement ply at `leaf` (the df
    feature set's history input, board.cc _infos[].last_placed).

    The edge into a node X placed a stone at parent_a[X]; its 1-based
    placement ply equals tree.ply[X] (step() stamps pre-move ply + 1).
    Walking leaf -> root visits the latest placements first, so
    keep-first-write gives the overwrite semantics of forward play; below
    the root the game state's `root_lp` [B, n2] fills the rest."""
    K = leaf.shape[0]
    n2 = size * size
    pts = jnp.arange(n2, dtype=jnp.int32)[None, :]

    def cond(carry):
        _, _, _, active = carry
        return jnp.any(active)

    def body(carry):
        lp, filled, cur, active = carry
        safe = jnp.clip(cur, 0, tree.stones.shape[1] - 1)
        a = tree.parent_a[rows, safe].astype(jnp.int32)
        parent = tree.parent[rows, safe].astype(jnp.int32)
        is_stone = active & (parent >= 0) & (a >= 0) & (a < n2)
        onehot = (pts == a[:, None]) & is_stone[:, None] & ~filled
        ply_1b = tree.ply[rows, safe].astype(jnp.int32)
        lp = jnp.where(onehot, ply_1b[:, None], lp)
        filled = filled | onehot
        active = active & (parent >= 0)
        cur = jnp.where(active, parent, cur)
        return lp, filled, cur, active

    lp0 = jnp.zeros((K, n2), jnp.int32)
    filled0 = jnp.zeros((K, n2), jnp.bool_)
    lp, filled, _, _ = lax.while_loop(
        cond, body, (lp0, filled0, leaf, jnp.ones((K,), jnp.bool_))
    )
    return jnp.where(filled, lp, root_lp[rows])


def _evaluate_states(
    core: GoCore,
    is_term: jax.Array,
    snaps: Optional[jax.Array],
    valid: Optional[jax.Array],
    legal: jax.Array,
    eval_fn: EvalFn,
    rng: jax.Array,
    cfg: MCTSConfig,
    size: int,
    last_is_pass: Optional[jax.Array] = None,
    leaf_lp: Optional[jax.Array] = None,
):
    """Evaluate K gathered states: (prior [K, A], value [K] black persp.).
    `legal` [K, A] comes from the tree (stored at expansion).
    `last_is_pass` [K]: whether the position was reached by a pass — the
    dangerous-pass heuristic only triggers when it was NOT
    (mcts.h:232 remove_pass_if_dangerous checks lastMove() != M_PASS).
    feature_set "agz" reads `snaps`/`valid`; "df" reads `leaf_lp`."""
    K = core.stones.shape[0]
    n2 = size * size
    if last_is_pass is None:
        last_is_pass = jnp.zeros((K,), jnp.bool_)

    codes = (
        jax.random.randint(rng, (K,), 0, 8)
        if cfg.rotation_flip
        else jnp.zeros((K,), jnp.int32)
    )
    if cfg.feature_set == "df":
        from elf_tpu.env.go.features import extract_df_parts

        ko_active = (core.ko_age == 0) & (core.ko_point >= 0)
        feats = extract_df_parts(
            core.stones, core.to_play, core.ko_point, ko_active,
            core.ply, leaf_lp, codes, size,
        )
    else:
        feats = extract_agz_from_snapshots(
            snaps, valid, core.to_play, codes, size
        )
    log_pi, value = eval_fn(feats, core.to_play)
    pi = jnp.exp(log_pi)
    pi = inv_transform_policy(pi, codes, size)

    # pass gating (mcts.h post_nn_result + remove_pass_if_dangerous)
    score = engine.score_tromp_taylor(core, size).astype(jnp.float32) - cfg.komi
    black_winning = score > 0
    mover_losing = jnp.where(core.to_play == BLACK, ~black_winning, black_winning)
    pass_ok = core.ply >= cfg.ply_pass_enabled
    if cfg.remove_pass_if_dangerous:
        pass_ok = pass_ok & (~mover_losing | last_is_pass)
    legal = legal.at[:, n2].set(legal[:, n2] & pass_ok)
    none_legal = ~jnp.any(legal, axis=1)
    legal = legal.at[:, n2].set(legal[:, n2] | none_legal)

    pi = jnp.where(legal, pi, 0.0)
    # exact reference normalization: total starts at 1e-10 (mcts.h:243)
    pi = pi / (pi.sum(axis=1, keepdims=True) + 1e-10)
    prior = jnp.where(legal, pi, -1.0)

    term_value = jnp.where(black_winning, 1.0, -1.0)
    value = jnp.where(is_term, term_value, value)
    return prior, value


def _backprop_multi(tree: Tree, rows: jax.Array, leaves: jax.Array,
                    values: jax.Array, active0: jax.Array,
                    vl_mult: jax.Array, cfg: MCTSConfig) -> Tree:
    """All K = m*B backprops of one simulation batch as ONE lockstep walk
    (the sequential per-rollout version ran m dependent while loops —
    pure latency at small batch).  Scatter-adds accumulate duplicate
    (board, node) hits from overlapping paths exactly like the
    sequential adds; addition commutes, so the visit counts are
    identical and w differs only by float reassociation."""
    K = leaves.shape[0]

    def cond(carry):
        _, _, active = carry
        return jnp.any(active)

    def body(carry):
        tree, cur, active = carry
        safe = jnp.clip(cur, 0, tree.stones.shape[1] - 1)
        p = tree.parent[rows, safe].astype(jnp.int32)
        upd = active & (p >= 0)
        node = jnp.where(upd, safe, tree.stones.shape[1])  # drop non-upd
        tree = tree._replace(
            n=tree.n.at[rows, node].add(1, mode="drop"),
            w=tree.w.at[rows, node].add(values, mode="drop"),
            vl=tree.vl.at[rows, node].add(
                -cfg.virtual_loss * vl_mult, mode="drop"
            ),
        )
        cur = jnp.where(upd, p, cur)
        return tree, cur, upd

    tree, _, _ = lax.while_loop(cond, body, (tree, leaves, active0))
    return tree


def fresh_tree(B: int, size: int, capacity: int, root_core: GoCore) -> Tree:
    """An empty tree (unexpanded root = root_core) at the given capacity —
    the starting point for persistent-tree actors."""
    tree = _make_tree(B, size, capacity)
    tree = _write_core(tree, jnp.zeros((B,), jnp.int32), root_core,
                       jnp.ones((B,), jnp.bool_))
    return tree._replace(
        terminal=tree.terminal.at[:, 0].set(
            engine.is_terminal_core(root_core, size)
        )
    )


def reset_tree_where(tree: Tree, mask: jax.Array, root_core: GoCore) -> Tree:
    """Invalidate trees for boards where mask is True (game restarted):
    their root becomes the given core with no children/stats."""
    B = mask.shape[0]
    size = int(np.sqrt(tree.stones.shape[2]))
    fresh = fresh_tree(B, size, tree.stones.shape[1], root_core)

    def sel(a, b):
        c = mask.reshape((B,) + (1,) * (a.ndim - 1))
        return jnp.where(c, a, b)

    return jax.tree.map(sel, fresh, tree)


def advance_tree(
    tree: Tree,
    actions: jax.Array,        # i32 [B] the move played from each root
    new_root_core: GoCore,     # the stepped env state (authoritative)
    size: int,
    capacity: int,
) -> Tree:
    """Re-root each tree at the played move's child, keeping subtree stats
    (tree_search_node.h:420 `treeAdvance`): nodes outside the subtree are
    dropped, indices compacted (allocation order keeps parents before
    children, so the new root compacts to node 0).  Boards whose action had
    no visited child get a fresh single-node tree."""
    B, N = tree.stones.shape[:2]
    A = tree.prior.shape[2]
    rows = jnp.arange(B)
    a = jnp.clip(actions, 0, A - 1)

    new_root = tree.child[rows, 0, a].astype(jnp.int32)
    has = new_root >= 0
    nr = jnp.clip(new_root, 0, N - 1)

    idx = jnp.broadcast_to(jnp.arange(N)[None, :], (B, N))
    alloc = idx < tree.count[:, None]
    member0 = (idx == nr[:, None]) & has[:, None] & alloc
    parent_i32 = tree.parent.astype(jnp.int32)
    parent_safe = jnp.clip(parent_i32, 0, N - 1)
    has_parent = parent_i32 >= 0

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        member, _ = carry
        from_parent = (
            jnp.take_along_axis(member, parent_safe, axis=1) & has_parent & alloc
        )
        newm = member | from_parent
        return newm, jnp.any(newm != member)

    member, _ = lax.while_loop(cond, body, (member0, jnp.bool_(True)))

    new_id = jnp.cumsum(member.astype(jnp.int32), axis=1) - 1  # valid on members
    dump = capacity  # scatter dump slot

    def scatter(arr, fill):
        pos = jnp.where(member, new_id, dump)
        out = jnp.full((B, capacity + 1) + arr.shape[2:], fill, arr.dtype)
        out = out.at[rows[:, None], pos].set(arr)
        return out[:, :capacity]

    # remap node-id-valued arrays before scattering
    child_i32 = tree.child.astype(jnp.int32)
    child_safe = jnp.clip(child_i32, 0, N - 1)
    child_member = member[rows[:, None, None], child_safe] & (child_i32 >= 0)
    child_remap = jnp.where(
        child_member, new_id[rows[:, None, None], child_safe], -1
    ).astype(jnp.int16)
    parent_member = (
        jnp.take_along_axis(member, parent_safe, axis=1) & has_parent
    )
    parent_remap = jnp.where(
        parent_member, jnp.take_along_axis(new_id, parent_safe, axis=1), -1
    ).astype(jnp.int16)

    new_tree = Tree(
        stones=scatter(tree.stones, np.int8(0)),
        to_play=scatter(tree.to_play, np.int8(0)),
        ko_point=scatter(tree.ko_point, np.int16(-1)),
        ko_color=scatter(tree.ko_color, np.int8(0)),
        ko_age=scatter(tree.ko_age, _KO_INACTIVE),
        ply=scatter(tree.ply, np.int16(0)),
        passes=scatter(tree.passes, np.int8(0)),
        hash_lo=scatter(tree.hash_lo, np.uint32(0)),
        hash_hi=scatter(tree.hash_hi, np.uint32(0)),
        prior=scatter(tree.prior, jnp.bfloat16(-1.0)),
        child=scatter(child_remap, np.int16(-1)),
        n=scatter(tree.n, np.int32(0)),
        w=scatter(tree.w, np.float32(0.0)),
        vl=scatter(tree.vl, np.int32(0)),
        parent=scatter(parent_remap, np.int16(-1)),
        parent_a=scatter(tree.parent_a, np.int16(-1)),
        expanded=scatter(tree.expanded, False),
        terminal=scatter(tree.terminal, False),
        value=scatter(tree.value, np.float32(0.0)),
        superko=scatter(tree.superko, False),
        umean_q=scatter(tree.umean_q, np.float32(0.0)),
        uparent_q=scatter(tree.uparent_q, np.float32(0.0)),
        count=jnp.maximum(member.sum(axis=1).astype(jnp.int32), 1),
        root_raw_prior=jnp.full(
            (B, A), -1.0, jnp.float32
        ),  # patched below from the new root's (never-noised) prior
    )
    new_tree = new_tree._replace(
        root_raw_prior=new_tree.prior[:, 0].astype(jnp.float32)
    )
    # the new root (node 0): authoritative env core; detach from old parent
    new_tree = _write_core(
        new_tree, jnp.zeros((B,), jnp.int32), new_root_core,
        jnp.ones((B,), jnp.bool_),
    )
    new_tree = new_tree._replace(
        parent=new_tree.parent.at[:, 0].set(np.int16(-1)),
        parent_a=new_tree.parent_a.at[:, 0].set(np.int16(-1)),
        terminal=new_tree.terminal.at[:, 0].set(
            engine.is_terminal_core(new_root_core, size)
        ),
    )
    return new_tree


def mcts_root_prepare(
    root_core: GoCore,
    root_hist: jax.Array,
    root_hist_len: jax.Array,
    eval_fn: EvalFn,
    rng: jax.Array,
    cfg: MCTSConfig,
    size: int,
    init_tree: Optional[Tree] = None,
    root_last_placed: Optional[jax.Array] = None,
) -> Tree:
    """Phase 1 of a search: build/adopt the tree and evaluate + noise the
    root.  (run_mcts = prepare -> simulate -> finalize; the phases are
    exposed so callers can loop `mcts_simulate` from the host — one
    monolithic device execution of a production search runs minutes and
    trips TPU runtime watchdogs.)"""
    B = root_core.stones.shape[0]
    rows = jnp.arange(B)
    A = size * size + 1

    if init_tree is None:
        tree = _init_tree(B, size, cfg)
        tree = _write_core(tree, jnp.zeros((B,), jnp.int32), root_core,
                           jnp.ones((B,), jnp.bool_))
        tree = tree._replace(
            terminal=tree.terminal.at[:, 0].set(
                engine.is_terminal_core(root_core, size)
            )
        )
    else:
        tree = init_tree
    root_terminal = tree.terminal[:, 0]
    root_fresh = ~tree.expanded[:, 0]

    # root evaluation (fresh roots) + Dirichlet noise (all roots)
    k_eval, k_noise = jax.random.split(rng, 2)
    root_ids = jnp.zeros((B,), jnp.int32)
    root_legal = engine.legal_moves(root_core, size)
    if cfg.feature_set == "df":
        snaps = valid = None
        root_lp = root_last_placed
        if root_lp is None:
            root_lp = jnp.zeros((B, size * size), jnp.int32)
    else:
        snaps, valid = _leaf_snapshots(tree, rows, root_ids, root_hist,
                                       root_hist_len, size)
        root_lp = None
    prior_eval, value_eval = _evaluate_states(
        _core_at(tree, rows, root_ids, size), root_terminal,
        snaps, valid, root_legal, eval_fn, k_eval, cfg, size,
        last_is_pass=root_core.last_move >= size * size,
        leaf_lp=root_lp,
    )
    # reused roots re-mix noise into the stored RAW prior (the reference
    # rebuilds the root prior from the NN each search; blending into an
    # already-noised prior would compound noise across moves)
    raw_prior = jnp.where(
        root_fresh[:, None], prior_eval, tree.root_raw_prior
    )
    value = jnp.where(root_fresh, value_eval, tree.value[:, 0])
    prior = raw_prior
    if cfg.root_epsilon > 0:
        legal = prior >= 0
        noise = jax.random.gamma(k_noise, cfg.root_alpha, (B, A))
        noise = jnp.where(legal, noise, 0.0)
        noise = noise / jnp.maximum(noise.sum(axis=1, keepdims=True), 1e-10)
        base = jnp.maximum(prior, 0.0)
        base = base / jnp.maximum(base.sum(axis=1, keepdims=True), 1e-10)
        mixed = (1 - cfg.root_epsilon) * base + cfg.root_epsilon * noise
        prior = jnp.where(legal, mixed, -1.0)
    tree = tree._replace(
        prior=tree.prior.at[:, 0].set(prior.astype(jnp.bfloat16)),
        value=tree.value.at[:, 0].set(value),
        expanded=tree.expanded.at[:, 0].set(True),
        root_raw_prior=raw_prior,
    )
    return tree


def mcts_simulate(
    tree: Tree,
    root_hist: jax.Array,
    root_hist_len: jax.Array,
    eval_fn: EvalFn,
    rng: jax.Array,
    cfg: MCTSConfig,
    size: int,
    n_batches: int,
    game_hash_hist: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    batch_offset=0,
    root_last_placed: Optional[jax.Array] = None,
) -> Tree:
    """Phase 2: run `n_batches` simulation batches (each =
    rollouts_per_batch select/expand passes + one fused leaf evaluation +
    backprops).  Host-loopable: jit with the tree donated.

    `batch_offset`: global index of the first batch (host-chunked
    searches pass their cumulative offset so per-player rollout budgets
    — white_num_rollouts — count across chunks)."""
    B = tree.stones.shape[0]
    rows = jnp.arange(B)
    A = size * size + 1
    m = max(1, cfg.rollouts_per_batch)

    if cfg.white_num_rollouts > 0:
        black_nb = max(1, cfg.num_rollouts // m)
        white_nb = max(1, cfg.white_num_rollouts // m)
        opts_player = BLACK if cfg.white_opts_on_black else engine.WHITE
        budget = jnp.where(tree.to_play[:, 0] == opts_player,
                           white_nb, black_nb)
    else:
        budget = None

    N = tree.stones.shape[1]

    A_ = size * size + 1
    use_overlay = cfg.batched_writes == "on" or (
        cfg.batched_writes == "auto" and B * N * A_ >= (1 << 24)
    )

    def sim_batch(carry, batch_idx):
        tree, rng = carry
        active = None if budget is None else (batch_idx < budget)
        if game_hash_hist is not None:
            gl, gh, gn = game_hash_hist
        else:
            gl = gh = gn = None

        if use_overlay:
            def one_select(carry, j):
                tree, ov = carry
                tree, leaf, flush = _select_and_expand(
                    tree, cfg, size, gl, gh, gn, active=active, overlay=ov,
                )
                # record this rollout's new edge in overlay slot j
                slot = (jnp.arange(m) == j)[:, None]           # [m, 1]
                ov = _Overlay(
                    node=jnp.where(
                        slot,
                        jnp.where(flush.valid, flush.edge_node, -1)[None],
                        ov.node,
                    ),
                    a=jnp.where(slot, flush.edge_a[None], ov.a),
                    child=jnp.where(slot, flush.new_id[None], ov.child),
                )
                return (tree, ov), (leaf, flush)

            ov0 = _Overlay(
                node=jnp.full((m, B), -1, jnp.int32),
                a=jnp.zeros((m, B), jnp.int32),
                child=jnp.zeros((m, B), jnp.int32),
            )
            (tree, _), (leaves, flushes) = lax.scan(
                one_select, (tree, ov0), jnp.arange(m)
            )                                                  # leaves [m, B]

            # ---- ONE deferred flush of the batch's big-array writes ----
            # (invalid lanes are redirected out of bounds and dropped)
            rows_f = jnp.broadcast_to(rows[None, :], (m, B))
            ids = jnp.where(flushes.valid, flushes.new_id, N)
            en = jnp.where(flushes.valid, flushes.edge_node, N)
            tree = tree._replace(
                stones=tree.stones.at[rows_f, ids].set(
                    flushes.stones_row, mode="drop"
                ),
                prior=tree.prior.at[rows_f, ids].set(
                    flushes.prior_row, mode="drop"
                ),
                child=tree.child.at[rows_f, en, flushes.edge_a].set(
                    flushes.new_id.astype(jnp.int16), mode="drop"
                ),
            )
        else:
            # small trees: immediate writes per rollout (no overlay
            # bookkeeping — scatters into small arrays are cheap and the
            # deferred-flush machinery would dominate)
            def one_select_direct(tree, _j):
                tree, leaf, _ = _select_and_expand(
                    tree, cfg, size, gl, gh, gn, active=active, overlay=None,
                )
                return tree, leaf

            tree, leaves = lax.scan(
                one_select_direct, tree, jnp.arange(m)
            )                                                  # leaves [m, B]

        # ---- one fused NN evaluation over all m*B leaves ----
        rng, k = jax.random.split(rng)
        flat_leaves = leaves.reshape(m * B)
        flat_rows = jnp.tile(rows, m)
        safe = jnp.clip(flat_leaves, 0, tree.stones.shape[1] - 1)
        flat_core = _core_at(tree, flat_rows, safe, size)
        flat_term = tree.terminal[flat_rows, safe]
        if cfg.feature_set == "df":
            snaps = valid = None
            rlp = (root_last_placed
                   if root_last_placed is not None
                   else jnp.zeros((B, size * size), jnp.int32))
            leaf_lp = _leaf_last_placed(tree, flat_rows, safe, rlp, size)
        else:
            snaps, valid = _leaf_snapshots(tree, flat_rows, safe, root_hist,
                                           root_hist_len, size)
            leaf_lp = None
        # legality is encoded in the stored prior's sign
        flat_legal = tree.prior[flat_rows, safe] >= 0
        # the leaf's incoming edge: pass-reached positions relax the
        # dangerous-pass gate (mcts.h:232).  Root leaves (parent_a = -1)
        # never take this path with their prior (already expanded).
        flat_lip = tree.parent_a[flat_rows, safe].astype(jnp.int32) == (A - 1)
        mB = m * B
        if cfg.eval_chunk and mB > cfg.eval_chunk and mB % cfg.eval_chunk == 0:
            # bounded-peak evaluation: sequential chunks of eval_chunk
            nch = mB // cfg.eval_chunk

            def chunked(x):
                return x.reshape((nch, cfg.eval_chunk) + x.shape[1:])

            keys = jax.random.split(k, nch)
            is_df = cfg.feature_set == "df"

            def one_chunk(args):
                core_c, term_c, hist_c, legal_c, lip_c, key_c = args
                if is_df:
                    return _evaluate_states(
                        core_c, term_c, None, None, legal_c, eval_fn,
                        key_c, cfg, size, last_is_pass=lip_c,
                        leaf_lp=hist_c,
                    )
                snaps_c, valid_c = hist_c
                return _evaluate_states(
                    core_c, term_c, snaps_c, valid_c, legal_c, eval_fn,
                    key_c, cfg, size, last_is_pass=lip_c,
                )

            hist_in = chunked(leaf_lp) if is_df else (
                chunked(snaps), chunked(valid)
            )
            priors, values = lax.map(
                one_chunk,
                (
                    jax.tree.map(chunked, flat_core),
                    chunked(flat_term),
                    hist_in,
                    chunked(flat_legal),
                    chunked(flat_lip),
                    keys,
                ),
            )
            priors = priors.reshape(mB, A)
            values = values.reshape(mB)
        else:
            priors, values = _evaluate_states(
                flat_core, flat_term, snaps, valid, flat_legal, eval_fn, k,
                cfg, size, last_is_pass=flat_lip, leaf_lp=leaf_lp,
            )
        # superko-terminal leaves use the stored next-player-wins value,
        # not the TT sign
        flat_sk = tree.superko[flat_rows, safe]
        values = jnp.where(flat_sk, tree.value[flat_rows, safe], values)

        # a leaf selected k > 1 times in this batch backprops ONCE (its
        # first occurrence) but removes all k virtual losses — duplicate
        # rollouts are wasted, exactly as the reference's traj_counts
        # dedup (tree_search.h:221-258)
        if m > 1:
            eq = leaves[:, None, :] == leaves[None, :, :]          # [m, m, B]
            earlier = jnp.tril(jnp.ones((m, m), jnp.bool_), -1)[:, :, None]
            is_dup = jnp.any(eq & earlier, axis=1)                 # [m, B]
            dup_count = jnp.sum(eq, axis=1).astype(jnp.int32)      # [m, B]
        else:
            is_dup = jnp.zeros((1, B), jnp.bool_)
            dup_count = jnp.ones((1, B), jnp.int32)

        # ---- ONE batched eval-prior flush (first occurrence of each
        # fresh non-terminal leaf writes its prior; same outcome as the
        # per-rollout writes, which only ever wrote on first touch) ----
        already0 = tree.expanded[flat_rows, safe]
        write_flat = ~is_dup.reshape(mB) & ~already0 & ~flat_term
        prior_ids = jnp.where(write_flat, safe, N)
        tree = tree._replace(
            prior=tree.prior.at[flat_rows, prior_ids].set(
                priors.astype(jnp.bfloat16), mode="drop"
            )
        )
        priors = priors.reshape(m, B, A)
        values = values.reshape(m, B)

        # ---- batched small-array writes + ONE multi-lane backprop ----
        # (the first occurrence of each leaf writes value/expanded;
        # duplicates are excluded by is_dup, so scatter writers are
        # unique; all m*B backprop walks run as one while loop)
        flat_vals = values.reshape(mB)
        flat_dup = is_dup.reshape(mB)
        # identical to the eval-prior flush mask above (terminal/
        # expanded have not been written since those gathers)
        is_term_f = flat_term
        write_f = write_flat
        vwrite = jnp.where(
            (write_f | is_term_f) & ~flat_dup, safe, N
        )
        tree = tree._replace(
            value=tree.value.at[flat_rows, vwrite].set(
                flat_vals, mode="drop"
            ),
            expanded=tree.expanded.at[
                flat_rows, jnp.where(write_f, safe, N)
            ].set(True, mode="drop"),
        )
        active0 = jnp.tile(~tree.terminal[:, 0], m) & ~flat_dup
        if active is not None:
            active0 = active0 & jnp.tile(active, m)
        tree = _backprop_multi(
            tree, flat_rows, safe, flat_vals, active0,
            dup_count.reshape(mB), cfg,
        )
        return (tree, rng), None

    (tree, _), _ = lax.scan(
        sim_batch, (tree, rng),
        jnp.arange(n_batches, dtype=jnp.int32) + batch_offset,
    )
    return tree


def mcts_finalize(tree: Tree, rng: jax.Array, cfg: MCTSConfig) -> MCTSResult:
    """Phase 3: read the root statistics into an MCTSResult."""
    B = tree.stones.shape[0]
    k_pick = rng
    n_root, w_root, _ = _edge_stats(tree, jnp.zeros((B,), jnp.int32))
    visits = n_root.astype(jnp.float32)                        # [B, A]
    root_prior = tree.prior[:, 0].astype(jnp.float32)
    legal_root = root_prior >= 0
    visits = jnp.where(legal_root, visits, 0.0)
    mcts_policy = visits / jnp.maximum(visits.sum(axis=1, keepdims=True), 1e-10)
    if cfg.pick_method == "prior":
        best = jnp.argmax(
            jnp.where(legal_root, root_prior, -1.0), axis=1
        ).astype(jnp.int32)
    elif cfg.pick_method == "uniform_random":
        logits = jnp.where(legal_root, 0.0, -1e9)
        best = jax.random.categorical(k_pick, logits, axis=1).astype(jnp.int32)
    else:  # most_visited
        best = jnp.argmax(
            visits + 1e-6 * jnp.maximum(root_prior, 0.0), axis=1
        ).astype(jnp.int32)
    root_q = jnp.sum(w_root, axis=1) / jnp.maximum(jnp.sum(visits, axis=1), 1.0)
    return MCTSResult(
        mcts_policy=mcts_policy,
        best_action=best,
        root_value=tree.value[:, 0],
        root_q=root_q,
    )


def run_mcts(
    root_core: GoCore,
    root_hist: jax.Array,       # i8 [B, 8, n2] game snapshots (oldest first)
    root_hist_len: jax.Array,   # i32 [B]
    eval_fn: EvalFn,
    rng: jax.Array,
    cfg: MCTSConfig,
    size: int,
    init_tree: Optional[Tree] = None,
    game_hash_hist: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    root_last_placed: Optional[jax.Array] = None,
) -> Tuple[MCTSResult, Tree]:
    """Run cfg.num_rollouts simulations for B boards in lockstep
    (prepare -> simulate -> finalize in one traceable call).

    `init_tree`: a tree re-rooted by `advance_tree` — reused subtree stats
    carry over; fresh Dirichlet noise is re-mixed into the (reused) root
    prior each move, as the reference re-noises each search.

    `game_hash_hist`: (hash_hist_lo [B,H], hash_hist_hi [B,H], nhash [B])
    from the game's GoState — enables in-tree superko detection against
    positions played before the root.

    For production budgets, call the three phases as separate jit calls
    and loop `mcts_simulate` from the host (the actor does this when
    MCTSConfig.max_batches_per_call > 0) — a monolithic device execution
    of a 1600-rollout search runs minutes and trips runtime watchdogs."""
    k_prep, k_sim, k_pick = jax.random.split(rng, 3)
    tree = mcts_root_prepare(
        root_core, root_hist, root_hist_len, eval_fn, k_prep, cfg, size,
        init_tree=init_tree, root_last_placed=root_last_placed,
    )
    m = max(1, cfg.rollouts_per_batch)
    n_batches = max(1, max(cfg.num_rollouts, cfg.white_num_rollouts) // m)
    tree = mcts_simulate(
        tree, root_hist, root_hist_len, eval_fn, k_sim, cfg, size,
        n_batches, game_hash_hist=game_hash_hist,
        root_last_placed=root_last_placed,
    )
    return mcts_finalize(tree, k_pick, cfg), tree
