"""Ladder behavioral suite runner.

Counterpart of the reference's `ladder_suite/` (116 SGF ladder scenarios +
`ladder_list` of (sgf, move-number) probes, README.rst:173): replay a game
to just before the probe move, ask the engine for a move, and compare with
the move actually played — a ladder-reading scorecard for a model.

Also provides `batch_replay`, which replays many SGF games through the
vectorized engine in lockstep and reports any move the engine considers
illegal — a rules-compatibility check against real-world games.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from elf_tpu.env.go import state as gostate
from elf_tpu.env.go.engine import BLACK, WHITE
from elf_tpu.env.go.state import init_state, legal_moves, step
from elf_tpu.sgf import parse_sgf

DEFAULT_SUITE = "/root/reference/ladder_suite"


def load_suite(suite_dir: str = DEFAULT_SUITE) -> List[Tuple[str, int]]:
    """[(sgf_path, move_number)] from ladder_list."""
    entries = []
    list_path = os.path.join(suite_dir, "ladder_list")
    with open(list_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2:
                entries.append(
                    (os.path.join(suite_dir, "ladder", parts[0]), int(parts[1]))
                )
    return entries


def load_moves(sgf_path: str) -> Tuple[List[int], int]:
    with open(sgf_path) as f:
        game = parse_sgf(f.read())
    size = game.board_size
    return [m for _, m in game.main_moves()], size


def batch_replay(move_lists: List[List[int]], size: int):
    """Replay many games in lockstep; returns (illegal_mask [B, L] bool,
    final_state).  Games shorter than L are padded with passes (masked)."""
    B = len(move_lists)
    L = max(len(m) for m in move_lists)
    n2 = size * size
    padded = np.full((B, L), n2, np.int32)
    valid = np.zeros((B, L), bool)
    for i, ms in enumerate(move_lists):
        padded[i, : len(ms)] = ms
        valid[i, : len(ms)] = True

    state = init_state(B, size)
    illegal = np.zeros((B, L), bool)
    for t in range(L):
        prev = state
        state, info = step(state, padded[:, t], size)
        bad = np.asarray(info.illegal) & valid[:, t]
        illegal[:, t] = bad
        # freeze boards that are past their game length
        state = gostate._tree_where(
            jax.numpy.asarray(~valid[:, t]), prev, state
        )
    return illegal, state


@dataclass
class LadderResult:
    total: int
    matched: int
    failures: List[Tuple[str, int, str, str]]  # (sgf, move#, expected, got)

    @property
    def accuracy(self) -> float:
        return self.matched / self.total if self.total else 0.0


def run_ladder_suite(
    gen_move_fn,
    suite_dir: str = DEFAULT_SUITE,
    limit: Optional[int] = None,
) -> LadderResult:
    """gen_move_fn(state, size) -> flat action.  For each (sgf, n) probe,
    replay to move n-1 (1-based list entries) and compare the generated
    move to the game's move."""
    from elf_tpu.env.go.coords import flat_to_gtp

    entries = load_suite(suite_dir)
    if limit:
        entries = entries[:limit]
    matched = 0
    failures = []
    for sgf_path, n in entries:
        moves, size = load_moves(sgf_path)
        if n >= len(moves):
            continue
        state = init_state(1, size)
        for m in moves[:n]:
            state, _ = step(state, np.array([m], np.int32), size)
        expected = moves[n]
        got = int(gen_move_fn(state, size))
        if got == expected:
            matched += 1
        else:
            failures.append(
                (os.path.basename(sgf_path), n,
                 flat_to_gtp(expected, size), flat_to_gtp(got, size))
            )
    return LadderResult(
        total=matched + len(failures), matched=matched, failures=failures
    )


def ladder_policy_scorecard(
    eval_fn,
    suite_dir: str = DEFAULT_SUITE,
    limit: Optional[int] = None,
) -> LadderResult:
    """Raw-policy scorecard over the whole suite in ONE lockstep batch.

    Same probe protocol as `run_ladder_suite` (replay to move n, compare
    the model's move with the game's move n) but vectorized: every probe
    prefix is replayed in one `batch_replay` call and the model is asked
    once on the stacked [B] positions — cheap enough to run inside a
    training loop's eval cadence.  `eval_fn(features, to_play)` must
    return `(log_pi, value)` (the SelfplayActor builder contract);
    the move compared is the legal-masked policy argmax (no search).
    """
    from elf_tpu.env.go import features as gofeat
    from elf_tpu.env.go.coords import flat_to_gtp

    entries = load_suite(suite_dir)
    if limit:
        entries = entries[:limit]
    probes = []  # (sgf_path, n, prefix_moves, expected, size)
    for sgf_path, n in entries:
        moves, size = load_moves(sgf_path)
        if n >= len(moves):
            continue
        probes.append((sgf_path, n, moves[:n], moves[n], size))
    if not probes:
        return LadderResult(total=0, matched=0, failures=[])
    size = probes[0][4]
    assert all(p[4] == size for p in probes), "mixed board sizes in suite"

    _, state = batch_replay([p[2] for p in probes], size)
    B = len(probes)
    feats = gofeat.extract_agz(
        state, jax.numpy.zeros((B,), jax.numpy.int32), size
    )
    log_pi, _ = eval_fn(feats, state.core.to_play)
    lm = legal_moves(state, size)
    got = np.asarray(
        jax.numpy.argmax(jax.numpy.where(lm, log_pi, -1e9), axis=1)
    )
    matched = 0
    failures = []
    for i, (sgf_path, n, _, expected, _) in enumerate(probes):
        if int(got[i]) == expected:
            matched += 1
        else:
            failures.append(
                (os.path.basename(sgf_path), n,
                 flat_to_gtp(expected, size), flat_to_gtp(int(got[i]), size))
            )
    return LadderResult(
        total=matched + len(failures), matched=matched, failures=failures
    )


@dataclass
class SuiteClassification:
    """Model-free structural read of one suite probe."""

    sgf: str
    move_number: int
    played: int
    classification: str   # capture | doomed_escape | none
    depth: int


def classify_suite(
    suite_dir: str = DEFAULT_SUITE, limit: Optional[int] = None
) -> List[SuiteClassification]:
    """Run the native ladder solver (native/ladder.c — the reference's
    checkLadder counterpart, golden-verified in tests/test_golden_ladder)
    over every ladder_list probe: classify the move actually played as a
    ladder-capture starter, a doomed escape, or neither.  Model-free —
    this reads the position itself, unlike `run_ladder_suite`, which
    scores a MODEL's move choice."""
    from elf_tpu.native.ladder import read_ladder
    from elf_tpu.native.replayer import replay_to_snapshots

    entries = load_suite(suite_dir)
    if limit:
        entries = entries[:limit]
    out = []
    for sgf_path, n in entries:
        moves, size = load_moves(sgf_path)
        if n - 1 >= len(moves):
            continue
        snaps = replay_to_snapshots(moves[: n - 1], size)
        board = (
            snaps[-1] if n > 1 else np.zeros(size * size, np.int8)
        )
        mv = moves[n - 1]
        player = 1 if (n - 1) % 2 == 0 else 2
        cls, depth = read_ladder(board, mv, player, size)
        out.append(SuiteClassification(
            sgf=os.path.basename(sgf_path), move_number=n, played=mv,
            classification=cls, depth=depth,
        ))
    return out
