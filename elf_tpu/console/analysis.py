"""SGF analysis mode: per-move AI suggestions + full search-tree dumps.

Counterpart of the reference's analysis surface (`analysis.sh`,
`/root/reference/README.rst:153-166`): preload an SGF
(`--preload_sgf /path --preload_sgf_move_to N`, game_selfplay.cc preload
path), then run the engine move by move, printing the suggested move with
its value and prior after each move, and writing one tree file per move
under `--dump_record_prefix` (`GoStateExt::saveCurrentTree`,
go_state_ext.h:158; content per `SearchTreeT::printTree`,
tree_search_node.h:484).

Two continuation modes:
  self-play (reference behavior): after the preload, the AI plays BOTH
      sides to the end of the game;
  follow: step through the SGF's remaining *actual* moves, reporting the
      AI's suggestion at each position — the "analyze an existing game"
      workflow (used for the human-games analysis the reference website
      showcases, README.rst:17).

Runs on the B=1 low-latency search path with persistent tree reuse, like
the GTP console.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, TextIO, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from elf_tpu.env.go import state as gostate
from elf_tpu.env.go.coords import flat_to_gtp
from elf_tpu.env.go.engine import BLACK
from elf_tpu.env.go.state import init_state, step
from elf_tpu.search.mcts import MCTSConfig, advance_tree, fresh_tree, run_mcts
from elf_tpu.search.tree_dump import render_tree, top_moves
from elf_tpu.sgf import parse_sgf


@dataclasses.dataclass(frozen=True)
class AnalysisConfig:
    preload_sgf: str = ""
    preload_sgf_move_to: int = -1   # -1 = whole record
    dump_record_prefix: str = ""    # write <prefix>_0_<ply>.tree per move
    follow_sgf: bool = False        # follow the record instead of self-play
    max_moves: int = 0              # 0 = to the end of the game
    komi: float = 7.5
    top_k: int = 5
    verbose: bool = False
    persistent_tree: bool = True


class AnalysisDriver:
    """Single-game analysis loop over the vectorized engine (B=1)."""

    def __init__(self, eval_fn_builder, mcts_cfg: MCTSConfig,
                 cfg: AnalysisConfig, size: int = 19, seed: int = 0):
        self.eval_fn_builder = eval_fn_builder
        self.mcts_cfg = mcts_cfg
        self.cfg = cfg
        self.size = size
        self.key = jax.random.PRNGKey(seed)
        self.params = None
        self.batch_stats = None
        self._jit_search = None
        self.state = init_state(1, size)
        self.tree = None
        self.sgf_moves: List[int] = []
        self.start_ply = 0

    def set_model(self, params, batch_stats) -> None:
        self.params = params
        self.batch_stats = batch_stats

    # -- position setup ----------------------------------------------------
    def load_sgf(self) -> None:
        if not self.cfg.preload_sgf:
            return
        with open(self.cfg.preload_sgf) as f:
            game = parse_sgf(f.read())
        if game.board_size != self.size:
            raise ValueError(
                f"SGF board size {game.board_size} != engine size {self.size}"
            )
        self.sgf_moves = [m for _, m in game.main_moves()]
        upto = self.cfg.preload_sgf_move_to
        if upto < 0:
            # -1 = whole record for self-play continuation (the reference
            # default); in follow mode start from the beginning so there is
            # something left to follow
            upto = 0 if self.cfg.follow_sgf else len(self.sgf_moves)
        upto = min(upto, len(self.sgf_moves))
        for a in self.sgf_moves[:upto]:
            self.state, _ = step(self.state, np.array([a], np.int32), self.size)
        self.start_ply = upto

    # -- search ------------------------------------------------------------
    def _search(self):
        if self._jit_search is None:
            cfg = self.mcts_cfg
            builder = self.eval_fn_builder

            def fn(core, hist, hlen, params, batch_stats, rng, tree_in,
                   hh_lo, hh_hi, nhash, last_placed):
                return run_mcts(
                    core, hist, hlen, builder(params, batch_stats), rng, cfg,
                    self.size, init_tree=tree_in,
                    game_hash_hist=(hh_lo, hh_hi, nhash),
                    # df leaves need the real placement history
                    root_last_placed=(last_placed
                                      if cfg.feature_set == "df" else None),
                )

            self._jit_search = jax.jit(fn)
        return self._jit_search

    def analyze_position(self):
        """Run one search at the current position; returns (action, root_q,
        suggestions, tree)."""
        if self.tree is None:
            cap = self.mcts_cfg.max_nodes or (2 * self.mcts_cfg.num_rollouts + 2)
            self.tree = fresh_tree(1, self.size, max(cap, 3), self.state.core)
        self.key, k = jax.random.split(self.key)
        res, tree = self._search()(
            self.state.core, self.state.stone_hist, self.state.hist_len,
            self.params, self.batch_stats, k, self.tree,
            self.state.hash_hist_lo, self.state.hash_hist_hi,
            self.state.nhash, self.state.last_placed,
        )
        self.tree = tree
        action = int(np.asarray(res.best_action)[0])
        root_q = float(np.asarray(res.root_q)[0])
        suggestions = top_moves(tree, 0, self.size, k=self.cfg.top_k)
        return action, root_q, suggestions, tree

    def _play(self, action: int) -> None:
        self.state, _ = step(self.state, np.array([action], np.int32), self.size)
        if self.cfg.persistent_tree and self.tree is not None:
            self.tree = advance_tree(
                self.tree, jnp.asarray([action], jnp.int32), self.state.core,
                self.size, self.tree.stones.shape[1],
            )
        else:
            self.tree = None

    def _ladder_annotation(self, played: int, mover: int) -> Optional[dict]:
        """Model-free ladder read of the move about to be played (the
        native checkLadder counterpart, native/ladder.c): flags moves
        that start a working ladder or flee into one."""
        if played >= self.size * self.size:
            return None
        from elf_tpu.native.ladder import read_ladder

        stones = np.asarray(self.state.core.stones)[0]
        ko_active = (
            int(np.asarray(self.state.core.ko_age)[0]) == 0
            and int(np.asarray(self.state.core.ko_point)[0]) >= 0
        )
        ko_point = (
            int(np.asarray(self.state.core.ko_point)[0]) if ko_active else -1
        )
        ko_color = int(np.asarray(self.state.core.ko_color)[0])
        try:
            cls, depth = read_ladder(
                stones, played, mover, self.size, ko_point, ko_color
            )
        except RuntimeError:
            return None
        if cls == "none":
            return None
        return {"type": cls, "depth": depth}

    def _dump_tree(self, ply: int, tree) -> Optional[str]:
        if not self.cfg.dump_record_prefix:
            return None
        path = f"{self.cfg.dump_record_prefix}_0_{ply}.tree"
        with open(path, "w") as f:
            f.write(render_tree(tree, 0, self.size))
        return path

    # -- the loop ----------------------------------------------------------
    def run(self, out: Optional[TextIO] = None) -> List[dict]:
        """Analyze move by move; returns one report dict per analyzed ply."""
        import sys

        out = out or sys.stdout
        self.load_sgf()
        reports: List[dict] = []
        ply = self.start_ply
        remaining = self.sgf_moves[self.start_ply:] if self.cfg.follow_sgf else []
        while True:
            if bool(np.asarray(self.state.terminated)[0]):
                break
            if self.cfg.max_moves and len(reports) >= self.cfg.max_moves:
                break
            if self.cfg.follow_sgf and not remaining:
                break
            mover = int(np.asarray(self.state.core.to_play)[0])
            action, root_q, suggestions, tree = self.analyze_position()
            mover_v = root_q if mover == BLACK else -root_q
            tree_path = self._dump_tree(ply, tree)
            played = remaining.pop(0) if self.cfg.follow_sgf else action
            rep = {
                "ply": ply,
                "to_play": "B" if mover == BLACK else "W",
                "suggested": flat_to_gtp(action, self.size),
                "value": round(mover_v, 4),
                "prior": round(
                    float(np.asarray(self.tree.prior[0, 0, action])), 4
                ),
                "played": flat_to_gtp(played, self.size),
                "top": suggestions,
            }
            if tree_path:
                rep["tree_file"] = tree_path
            ladder = self._ladder_annotation(played, mover)
            if ladder:
                rep["ladder"] = ladder
            reports.append(rep)
            line = (
                f"{rep['ply']:3d} {rep['to_play']} suggest {rep['suggested']}"
                f" V {rep['value']:+.3f} prior {rep['prior']:.3f}"
                f" played {rep['played']}"
            )
            if self.cfg.verbose:
                tops = " ".join(
                    f"{t['move']}(n={t['n']},q={t['q']:.2f})"
                    for t in rep["top"]
                )
                line += f"  | {tops}"
            print(line, file=out, flush=True)
            self._play(played)
            ply += 1
        score = float(
            np.asarray(gostate.evaluate(self.state, self.size, self.cfg.komi))[0]
        )
        result = f"B+{score:.1f}" if score > 0 else f"W+{-score:.1f}"
        print(f"final_score {result}", file=out, flush=True)
        return reports
