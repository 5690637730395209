"""MCTS sanity tests: visit accounting, virtual-loss cleanup, and tactical
preference with a score-aware evaluator (the array analog of the reference's
`mcts_test.cc` white-box node tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from elf_tpu.env.go import engine
from elf_tpu.env.go.engine import BLACK, WHITE, init_core
from elf_tpu.search.mcts import MCTSConfig, run_mcts
from elf_tpu.env.go.state import MAX_AGZ_HISTORY


def uniform_eval(num_actions):
    def eval_fn(feats, to_play):
        K = feats.shape[0]
        log_pi = jnp.full((K, num_actions), -np.log(num_actions))
        value = jnp.zeros((K,))
        return log_pi, value

    return eval_fn


def empty_hist(B, size):
    return (
        jnp.zeros((B, MAX_AGZ_HISTORY, size * size), jnp.int8),
        jnp.zeros((B,), jnp.int32),
    )


class TestMCTS:
    def test_visit_accounting(self):
        size = 5
        B = 2
        cfg = MCTSConfig(
            num_rollouts=32, rollouts_per_batch=4, c_puct=1.5,
            rotation_flip=False, remove_pass_if_dangerous=False,
        )
        core = init_core(B, size)
        hist, hlen = empty_hist(B, size)
        res, tree = run_mcts(
            core, hist, hlen, uniform_eval(26), jax.random.PRNGKey(0), cfg, size
        )
        n_root = np.asarray(tree.n_edge[:, 0]).sum(axis=1)
        # every rollout lands one root visit
        np.testing.assert_array_equal(n_root, [32, 32])
        # virtual loss fully removed
        assert int(np.abs(np.asarray(tree.vl_edge)).sum()) == 0
        # policy normalized
        np.testing.assert_allclose(
            np.asarray(res.mcts_policy).sum(axis=1), 1.0, rtol=1e-5
        )
        # node count == rollouts that expanded (<= rollouts + root)
        assert (np.asarray(tree.count) <= 32 + 2).all()

    def test_terminal_root(self):
        size = 5
        cfg = MCTSConfig(num_rollouts=8, rollouts_per_batch=2, rotation_flip=False)
        core = init_core(1, size)
        core = core._replace(passes=jnp.array([2]))  # already terminal
        hist, hlen = empty_hist(1, size)
        res, tree = run_mcts(
            core, hist, hlen, uniform_eval(26), jax.random.PRNGKey(0), cfg, size
        )
        assert int(np.asarray(tree.n_edge).sum()) == 0

    def test_prefers_winning_capture(self):
        """Black can capture a large white group; with a TT-score-aware value
        head MCTS must concentrate visits on the capture."""
        size = 5
        from tests.test_engine import core_from_oracle, make_oracle_from_diagram

        o = make_oracle_from_diagram(
            """
            O O O X .
            O O O X .
            X X X X .
            . . . . .
            . . . . .
            """,
            to_play=BLACK,
        )
        # white group has one liberty? (0,4)? no: neighbors of the 2x3 white
        # block: (0,3)X (1,3)X (2,0..2)X -> zero libs impossible; give one:
        o = make_oracle_from_diagram(
            """
            O O . X .
            O O X . .
            X X . . .
            . . . . .
            . . . . .
            """,
            to_play=BLACK,
        )
        core = core_from_oracle(o)
        capture_move = 2  # (0,2) captures the 4-stone white block

        def eval_fn(feats, to_play):
            K = feats.shape[0]
            log_pi = jnp.full((K, 26), -np.log(26.0))
            return log_pi, jnp.zeros((K,))

        # value signal comes only from terminal TT shortcuts; deepen search
        cfg = MCTSConfig(
            num_rollouts=128, rollouts_per_batch=8, c_puct=1.0,
            rotation_flip=False, komi=0.5, remove_pass_if_dangerous=True,
        )
        hist, hlen = empty_hist(1, size)
        res, tree = run_mcts(
            core, hist, hlen, eval_fn, jax.random.PRNGKey(1), cfg, size
        )
        # capture must be legal at root and receive meaningful visits
        prior = np.asarray(tree.prior[0, 0])
        assert prior[capture_move] >= 0
        pol = np.asarray(res.mcts_policy[0])
        assert pol[capture_move] > 0.02

    def test_deterministic_given_key(self):
        size = 5
        cfg = MCTSConfig(num_rollouts=16, rollouts_per_batch=4, rotation_flip=True)
        core = init_core(1, size)
        hist, hlen = empty_hist(1, size)
        r1, _ = run_mcts(core, hist, hlen, uniform_eval(26),
                         jax.random.PRNGKey(7), cfg, size)
        r2, _ = run_mcts(core, hist, hlen, uniform_eval(26),
                         jax.random.PRNGKey(7), cfg, size)
        np.testing.assert_array_equal(
            np.asarray(r1.best_action), np.asarray(r2.best_action)
        )
        np.testing.assert_allclose(
            np.asarray(r1.mcts_policy), np.asarray(r2.mcts_policy)
        )


class TestTreeReuse:
    def test_advance_preserves_subtree(self):
        """advance_tree re-roots at the played child: stats carry over,
        indices compact, and a follow-up search runs correctly."""
        from elf_tpu.search.mcts import advance_tree, run_mcts
        from elf_tpu.env.go import engine as goeng

        size = 5
        B = 2
        cfg = MCTSConfig(num_rollouts=24, rollouts_per_batch=4,
                         rotation_flip=False, remove_pass_if_dangerous=False)
        core = init_core(B, size)
        hist, hlen = empty_hist(B, size)
        res, tree = run_mcts(core, hist, hlen, uniform_eval(26),
                             jax.random.PRNGKey(0), cfg, size)
        a = res.best_action
        n_sub = np.asarray(tree.n_edge[np.arange(B), 0, np.asarray(a)])
        child = np.asarray(tree.child[np.arange(B), 0, np.asarray(a)])
        assert (child >= 0).all()
        child_visits_before = np.asarray(
            tree.n_edge[np.arange(B), child]
        ).sum(axis=1)

        core2, _ = engine.step_core(core, a, size)
        capacity = 2 * cfg.num_rollouts + 2
        t2 = advance_tree(tree, a, core2, size, capacity)
        # new root carries the child's edge statistics
        np.testing.assert_array_equal(
            np.asarray(t2.n_edge[:, 0]).sum(axis=1), child_visits_before
        )
        # root core matches the stepped env state
        np.testing.assert_array_equal(
            np.asarray(t2.stones[:, 0]), np.asarray(core2.stones)
        )
        assert (np.asarray(t2.parent[:, 0]) == -1).all()
        # parent/child consistency in the compacted tree
        t2p = np.asarray(t2.parent)
        t2c = np.asarray(t2.child)
        cnt = np.asarray(t2.count)
        for b in range(B):
            for n in range(1, cnt[b]):
                p = t2p[b, n]
                assert 0 <= p < cnt[b]
                pa = int(np.asarray(t2.parent_a)[b, n])
                assert t2c[b, p, pa] == n

        # continue searching from the reused tree
        res2, t3 = run_mcts(core2, hist, hlen, uniform_eval(26),
                            jax.random.PRNGKey(1), cfg, size, init_tree=t2)
        added = np.asarray(t3.n_edge[:, 0]).sum(axis=1) - child_visits_before
        np.testing.assert_array_equal(added, [cfg.num_rollouts] * B)
        assert int(np.abs(np.asarray(t3.vl_edge)).sum()) == 0

    def test_advance_unvisited_child(self):
        """Advancing along an unvisited action yields a fresh tree."""
        from elf_tpu.search.mcts import advance_tree, run_mcts

        size = 5
        cfg = MCTSConfig(num_rollouts=4, rollouts_per_batch=2,
                         rotation_flip=False, remove_pass_if_dangerous=False)
        core = init_core(1, size)
        hist, hlen = empty_hist(1, size)
        res, tree = run_mcts(core, hist, hlen, uniform_eval(26),
                             jax.random.PRNGKey(0), cfg, size)
        # find an action with no child
        child_row = np.asarray(tree.child[0, 0])
        unvisited = int(np.nonzero(child_row < 0)[0][0])
        core2, _ = engine.step_core(core, np.array([unvisited]), size)
        t2 = advance_tree(tree, np.array([unvisited]), core2, size, 10)
        assert int(t2.count[0]) == 1
        assert not bool(t2.expanded[0, 0])
        # a fresh search from it works
        res2, _ = run_mcts(core2, hist, hlen, uniform_eval(26),
                           jax.random.PRNGKey(1), cfg, size, init_tree=t2)
        assert abs(float(res2.mcts_policy[0].sum()) - 1.0) < 1e-5


class TestCapacityClamp:
    def test_int16_capacity_clamp(self):
        """Reuse capacity beyond int16 node ids clamps instead of
        overflowing (gtp.sh plays 16384 rollouts -> 2*16384+2 reuse)."""
        from elf_tpu.search.mcts import fresh_tree

        t = fresh_tree(1, 5, 2 * 16384 + 2, init_core(1, 5))
        assert t.stones.shape[1] == 32767
        assert t.child.dtype == jnp.int16


class TestInTreeSuperko:
    def test_repetition_marked_terminal(self):
        """A ko-retake inside the search that recreates the parent-parent
        position must be marked superko-terminal with next-player-wins
        value."""
        from elf_tpu.search.mcts import run_mcts
        from tests.test_engine import core_from_oracle, make_oracle_from_diagram

        # ko shape: black takes at 7 capturing 6; white retaking at 6
        # immediately is the simple-ko ban, but after ko_age passes in-tree
        # (via a pass move) the retake recreates the position.
        o = make_oracle_from_diagram(
            """
            . X O . .
            X O . O .
            . X O . .
            . . . . .
            . . . . .
            """,
        )
        core = core_from_oracle(o)
        # give the root a real hash base by replaying via step_core
        cfg = MCTSConfig(num_rollouts=64, rollouts_per_batch=8,
                         rotation_flip=False, remove_pass_if_dangerous=False,
                         c_puct=2.0)
        hist, hlen = empty_hist(1, 5)
        res, tree = run_mcts(core, hist, hlen, uniform_eval(26),
                             jax.random.PRNGKey(3), cfg, 5)
        sk = np.asarray(tree.superko)
        cnt = int(tree.count[0])
        # with 64 rollouts from a ko position some line revisits a position;
        # at minimum the mechanism must not fire spuriously on pass chains
        term = np.asarray(tree.terminal)[0, :cnt]
        passes = np.asarray(tree.passes)[0, :cnt]
        # any superko-marked node must be a stone-move child
        for n in np.nonzero(sk[0, :cnt])[0]:
            pa = int(np.asarray(tree.parent_a)[0, n])
            assert pa < 25, "pass move marked as superko"
            v = float(np.asarray(tree.value)[0, n])
            assert v in (-1.0, 1.0)


class TestPerPlayerOptions:
    def test_white_rollout_budget(self):
        """white_num_rollouts caps white-rooted boards' searches
        (go_game_specific.h:90 white_mcts_rollout_per_thread)."""
        size = 5
        B = 2
        core = init_core(B, size)
        # board 1: white to move at the root
        core = core._replace(
            to_play=jnp.asarray([BLACK, WHITE], jnp.int8)
        )
        cfg = MCTSConfig(
            num_rollouts=32, rollouts_per_batch=4, c_puct=1.5,
            rotation_flip=False, remove_pass_if_dangerous=False,
            white_num_rollouts=16,
        )
        hist, hlen = empty_hist(B, size)
        _, tree = run_mcts(core, hist, hlen, uniform_eval(26),
                           jax.random.PRNGKey(0), cfg, size)
        root_visits = np.asarray(tree.n_edge)[:, 0].sum(axis=1)
        assert root_visits[0] == 32   # black budget
        assert root_visits[1] == 16   # white budget

    def test_white_budget_chunked_offset(self):
        """The budget counts across host-chunked simulate calls."""
        from elf_tpu.search.mcts import (
            mcts_finalize, mcts_root_prepare, mcts_simulate,
        )

        size = 5
        B = 2
        core = init_core(B, size)
        core = core._replace(to_play=jnp.asarray([BLACK, WHITE], jnp.int8))
        cfg = MCTSConfig(
            num_rollouts=32, rollouts_per_batch=4, c_puct=1.5,
            rotation_flip=False, remove_pass_if_dangerous=False,
            white_num_rollouts=16,
        )
        hist, hlen = empty_hist(B, size)
        eval_fn = uniform_eval(26)
        tree = mcts_root_prepare(core, hist, hlen, eval_fn,
                                 jax.random.PRNGKey(1), cfg, size)
        # 8 total sim batches in chunks of 2, offsets threaded through
        for i in range(4):
            tree = mcts_simulate(tree, hist, hlen, eval_fn,
                                 jax.random.fold_in(jax.random.PRNGKey(2), i),
                                 cfg, size, 2, batch_offset=2 * i)
        root_visits = np.asarray(tree.n_edge)[:, 0].sum(axis=1)
        assert root_visits[0] == 32
        assert root_visits[1] == 16

    def test_white_opts_on_black_flips_keying(self):
        """player_swap moves the white-options AI onto black
        (game_selfplay.cc:182): the budget follows the MODEL, not the
        color."""
        size = 5
        B = 2
        core = init_core(B, size)
        core = core._replace(to_play=jnp.asarray([BLACK, WHITE], jnp.int8))
        cfg = MCTSConfig(
            num_rollouts=32, rollouts_per_batch=4, c_puct=1.5,
            rotation_flip=False, remove_pass_if_dangerous=False,
            white_num_rollouts=16, white_opts_on_black=True,
        )
        hist, hlen = empty_hist(B, size)
        _, tree = run_mcts(core, hist, hlen, uniform_eval(26),
                           jax.random.PRNGKey(0), cfg, size)
        root_visits = np.asarray(tree.n_edge)[:, 0].sum(axis=1)
        assert root_visits[0] == 16   # black-rooted board: white-model opts
        assert root_visits[1] == 32

    def test_edge_stats_onehot_matches_gather(self):
        """The MXU one-hot contraction (big-tree path) must be bit-exact
        vs the direct gather."""
        import elf_tpu.search.mcts as M

        rng = np.random.RandomState(7)
        B, N, A = 16, 300, 26
        n2 = 25
        tree = M._make_tree(B, 5, N)
        child = np.full((B, N, A), -1, np.int16)
        # random sparse children with node-resident stats
        n_arr = np.zeros((B, N), np.int32)
        w_arr = np.zeros((B, N), np.float32)
        vl_arr = np.zeros((B, N), np.int32)
        for b in range(B):
            k = 20
            ids = rng.permutation(N - 1)[:k] + 1
            acts = rng.permutation(A)[:k]
            child[b, 0, acts] = ids
            n_arr[b, ids] = rng.randint(0, 1601, len(ids))
            w_arr[b, ids] = rng.randn(len(ids)) * 300
            vl_arr[b, ids] = rng.randint(0, 41, len(ids))
        tree = tree._replace(
            child=jnp.asarray(child),
            n=jnp.asarray(n_arr),
            w=jnp.asarray(w_arr),
            vl=jnp.asarray(vl_arr),
        )
        node = jnp.zeros((B,), jnp.int32)
        n_g, w_g, vl_g = M._edge_stats(tree, node)  # small size -> gather

        def forced(tree, node):
            # replicate the one-hot branch with the same inputs
            rows = jnp.arange(B)
            ch = tree.child[rows, node].astype(jnp.int32)
            has = ch >= 0
            cs = jnp.clip(ch, 0, N - 1)
            onehot = (
                (cs[:, :, None]
                 == jnp.arange(N, dtype=jnp.int32)[None, None, :])
                & has[:, :, None]
            ).astype(jnp.float32)
            stats = jnp.stack(
                [tree.n.astype(jnp.float32), tree.w,
                 tree.vl.astype(jnp.float32)], axis=-1,
            )
            out = jax.lax.dot_general(
                onehot, stats,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return (jnp.round(out[..., 0]).astype(jnp.int32), out[..., 1],
                    jnp.round(out[..., 2]).astype(jnp.int32))

        n_o, w_o, vl_o = forced(tree, node)
        np.testing.assert_array_equal(np.asarray(n_g), np.asarray(n_o))
        np.testing.assert_array_equal(np.asarray(vl_g), np.asarray(vl_o))
        np.testing.assert_array_equal(np.asarray(w_g), np.asarray(w_o))


def test_edge_stats_onehot_path_exact():
    """The bf16-piece MXU contraction in _edge_stats (taken when
    B*A*N >= 2^24 — production shapes) must agree EXACTLY with the
    small-shape gather path, including large reused-tree visit counts
    (3-digit base-256 n split) and adversarial w values."""
    import numpy as np
    import jax.numpy as jnp

    from elf_tpu.search import mcts as M

    B, N = 128, 512
    size = 19
    A = size * size + 1
    assert B * A * N >= (1 << 24)
    rng = np.random.RandomState(42)
    tree = M._make_tree(B, size, N)
    n = rng.randint(0, 5_000_000, (B, N)).astype(np.int32)  # reuse-scale
    w = (rng.rand(B, N).astype(np.float32) * 2 - 1) * n.astype(np.float32)
    vl = rng.randint(0, 60, (B, N)).astype(np.int32)
    child = rng.randint(-1, N, (B, N, A)).astype(np.int16)
    tree = tree._replace(
        n=jnp.asarray(n), w=jnp.asarray(w), vl=jnp.asarray(vl),
        child=jnp.asarray(child),
    )
    node = jnp.asarray(rng.randint(0, N, (B,)).astype(np.int32))

    got_n, got_w, got_vl = jax.jit(M._edge_stats)(tree, node)

    # reference: plain per-row gather (the small-shape path, exact)
    rows = np.arange(B)[:, None]
    ch = child.astype(np.int64)[np.arange(B), np.asarray(node)]  # [B, A]
    has = ch >= 0
    cs = np.clip(ch, 0, N - 1)
    ref_n = np.where(has, n[rows, cs], 0)
    ref_w = np.where(has, w[rows, cs], 0.0)
    ref_vl = np.where(has, vl[rows, cs], 0)
    np.testing.assert_array_equal(np.asarray(got_n), ref_n)
    np.testing.assert_array_equal(np.asarray(got_vl), ref_vl)
    np.testing.assert_array_equal(np.asarray(got_w), ref_w)  # EXACT
