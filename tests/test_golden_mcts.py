"""MCTS decision parity vs the REFERENCE'S OWN tree-search machinery.

tests/golden/ref_mcts_{9,19}.jsonl.gz were produced by
tools/golden_ref/gen_mcts_golden.cc, which runs the reference's
NodeT/EdgeInfo/SearchTreeT (tree_search_node.h — PUCT with first-play
urgency, unsignedMeanQ updates, virtual loss, lazy child allocation,
edge backprop) plus the Go actor's pass-gating/renormalization semantics
(mcts/mcts.h), single-threaded, over 9x9 and 19x19 positions with a
deterministic pseudo-NN — both one-rollout batches and virtual-loss
batches (m=8, batch_rollouts dedup semantics).

This test replays the identical searches through elf_tpu.search.mcts
(array-of-trees, lockstep) and demands the SAME per-action root visit
counts — validating PUCT selection math, FPU defaults, terminal/superko
handling and backprop against the reference implementation itself.
"""

import gzip
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elf_tpu.env.go import engine, state as gostate
from elf_tpu.search.mcts import MCTSConfig, run_mcts

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _load(size):
    path = os.path.join(GOLDEN_DIR, f"ref_mcts_{size}.jsonl.gz")
    with gzip.open(path, "rt") as f:
        return [json.loads(line) for line in f]


def _play_prefix(k: int, size: int):
    """Deterministic prefix mirroring gen_mcts_golden.cc play_prefix."""
    n2 = size * size
    st = gostate.init_state(1, size)
    for i in range(k):
        legal = np.asarray(gostate.legal_moves(st, size))[0, :n2]
        cand = np.nonzero(legal)[0]
        if len(cand) == 0:
            break
        a = int(cand[(i * 37 + 11) % len(cand)])
        st, _ = gostate.step(st, jnp.array([a], jnp.int32), size)
    return st


def _raw_priors(A):
    # gen_mcts_golden.cc raw_prior: tie-free geometric ladder (2 bf16
    # ulps apart so bf16-rounded normalized priors never collide)
    perm = ((np.arange(A, dtype=np.int64) * 37 + 13) % A)
    return (
        (1.0 + (perm % 64) / 64.0) * np.exp2(perm // 64)
    ).astype(np.float32)


def _make_eval_fn(size):
    n2 = size * size
    A = n2 + 1

    def eval_fn(feats, to_play):
        """Pseudo-NN matching gen_mcts_golden.cc: fixed per-action priors,
        value = clip(0.05 * (black_stones - white_stones), -1, 1)."""
        K = feats.shape[0]
        log_pi = jnp.broadcast_to(
            jnp.log(jnp.asarray(_raw_priors(A)))[None, :], (K, A)
        )
        mine = feats[..., 0].reshape(K, n2).sum(axis=1)
        theirs = feats[..., 1].reshape(K, n2).sum(axis=1)
        black = jnp.where(to_play == engine.BLACK, mine, theirs)
        white = jnp.where(to_play == engine.BLACK, theirs, mine)
        v = jnp.clip((black - white) * 0.05, -1.0, 1.0)
        return log_pi, v

    return eval_fn


def _run_case(g, size, batched_writes="auto"):
    n2 = size * size
    A = n2 + 1
    st = _play_prefix(g["prefix"], size)
    cfg = MCTSConfig(
        num_rollouts=g["rollouts"],
        rollouts_per_batch=int(g.get("per_batch", 1)),
        c_puct=g["c_puct"],
        virtual_loss=int(g["vl"]),
        root_epsilon=0.0,
        komi=7.5,
        ply_pass_enabled=0,
        remove_pass_if_dangerous=True,
        rotation_flip=False,
        unexplored_q_zero=bool(g["uqz"]),
        root_unexplored_q_zero=bool(g["ruqz"]),
        batched_writes=batched_writes,
    )
    eval_fn = _make_eval_fn(size)
    res, tree = jax.jit(
        lambda core, hist, hlen, hl, hh, nh, key: run_mcts(
            core, hist, hlen, eval_fn, key, cfg, size,
            game_hash_hist=(hl, hh, nh),
        )
    )(
        st.core, st.stone_hist, st.hist_len,
        st.hash_hist_lo, st.hash_hist_hi, st.nhash,
        jax.random.PRNGKey(0),
    )

    ref_n = np.zeros(A, np.int64)
    ref_w = np.zeros(A, np.float64)
    for e in g["edges"]:
        ref_n[e["a"]] = e["n"]
        ref_w[e["a"]] = e["w"]

    ours_n = np.asarray(tree.n_edge)[0, 0]          # [A]
    ours_w = np.asarray(tree.w_edge)[0, 0]

    assert int(ours_n.sum()) == g["root_n"], (
        f"total root visits {ours_n.sum()} != {g['root_n']}"
    )
    label = f"size {size} prefix {g['prefix']} m {g.get('per_batch', 1)}"
    if not np.array_equal(ours_n, ref_n):
        diff = np.nonzero(ours_n != ref_n)[0]
        msg = "; ".join(
            f"a={a}: ours {ours_n[a]} ref {ref_n[a]}" for a in diff[:12]
        )
        raise AssertionError(f"visit mismatch ({label}): {msg}")
    np.testing.assert_allclose(ours_w, ref_w, atol=5e-4,
                               err_msg=f"w mismatch ({label})")
    assert res.root_value[0] == pytest.approx(g["root_value"], abs=1e-6)


@pytest.mark.parametrize("idx", range(9))
def test_mcts_visit_parity_9(idx):
    games = _load(9)
    if idx >= len(games):
        pytest.skip("fixture has fewer configs")
    _run_case(games[idx], 9)


@pytest.mark.parametrize("idx", range(2))
def test_mcts_visit_parity_19(idx):
    games = _load(19)
    if idx >= len(games):
        pytest.skip("fixture has fewer configs")
    _run_case(games[idx], 19)


@pytest.mark.parametrize("batched_writes", ["on", "off"])
def test_mcts_visit_parity_both_write_paths(batched_writes):
    """The deferred-flush overlay path and the immediate-write path must
    BOTH reproduce the reference's visit counts exactly (batched_writes
    'auto' picks by problem size, so golden coverage pins each
    explicitly, on a virtual-loss m=8 config where in-batch visibility
    matters most)."""
    games = [g for g in _load(9) if int(g.get("per_batch", 1)) > 1]
    if not games:
        pytest.skip("no multi-leaf config in fixture")
    _run_case(games[0], 9, batched_writes=batched_writes)
