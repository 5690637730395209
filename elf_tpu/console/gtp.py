"""GTP (Go Text Protocol) console: play/analysis surface.

Counterpart of `/root/reference/scripts/elfgames/go/df_console.py` +
`console_lib.py:207` (GoConsoleGTP): a single-game driver where the human
side arrives over GTP (`play`) and the engine side is MCTS + the
policy/value net (`genmove`).  The reference runs this through the
`human_actor`/`actor_black` shared-memory callbacks with batchsize 1; here
the engine is simply a B=1 jitted MCTS call — the online low-latency path
(the analog of `mcts_rollout_per_batch` + 10 us timeout, game.py:366).

Implements the standard command set: protocol_version, name, version,
known_command, list_commands, quit, boardsize, clear_board, komi, play,
genmove, undo, final_score, showboard + kgs-game_over.
"""

from __future__ import annotations

import sys
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from elf_tpu.env.go import state as gostate
from elf_tpu.env.go.coords import flat_to_gtp, gtp_to_flat
from elf_tpu.env.go.engine import BLACK, WHITE
from elf_tpu.env.go.state import init_state, legal_moves, step
from elf_tpu.search.mcts import MCTSConfig, run_mcts


class GtpEngine:
    """Single-game engine state + MCTS move generation."""

    def __init__(self, eval_fn_builder, mcts_cfg: MCTSConfig,
                 size: int = 19, komi: float = 7.5, seed: int = 0,
                 persistent_tree: bool = True, following_pass: bool = False,
                 resign_thres: float = 0.05):
        self.eval_fn_builder = eval_fn_builder
        self.mcts_cfg = mcts_cfg
        self.komi = komi
        # resign when mover value < -1 + resign_thres (ResignCheck,
        # game_utils.h:15); 0 disables resignation (analysis mode,
        # README.rst:164 resign_thres 0.0)
        self.resign_thres = resign_thres
        self.params = None
        self.batch_stats = None
        self.key = jax.random.PRNGKey(seed)
        self._searches = {}
        # tree reuse across genmove/play (treeAdvance): big win at GTP
        # rollout counts since the played line's subtree carries over
        self.persistent_tree = persistent_tree
        # answer an opponent pass with a pass when clearly winning
        # (mcts_update_info following_pass, game_selfplay.cc:106)
        self.following_pass = following_pass
        self.tree = None
        self.reset(size)

    def set_model(self, params, batch_stats) -> None:
        self.params = params
        self.batch_stats = batch_stats

    def reset(self, size: Optional[int] = None) -> None:
        if size is not None:
            self.size = size
        self.state = init_state(1, self.size)
        self.history: List = [self.state]
        self.tree = None

    def _advance(self, action: int) -> None:
        """Carry the search tree across the played move."""
        if not self.persistent_tree or self.tree is None:
            self.tree = None
            return
        from elf_tpu.search.mcts import advance_tree

        self.tree = advance_tree(
            self.tree, jnp.asarray([action], jnp.int32), self.state.core,
            self.size, self.tree.stones.shape[1],
        )

    def _search_fn(self):
        key = (self.size,)
        if key not in self._searches:
            import functools

            cfg = self.mcts_cfg
            eval_fn = self.eval_fn_builder

            def fn(core, hist, hlen, params, batch_stats, rng, tree_in,
                   hh_lo, hh_hi, nhash, last_placed):
                return run_mcts(
                    core, hist, hlen,
                    eval_fn(params, batch_stats), rng, cfg, self.size,
                    init_tree=tree_in,
                    game_hash_hist=(hh_lo, hh_hi, nhash),
                    # df leaves rebuild placement-history planes from
                    # the REAL game last_placed, as selfplay does
                    root_last_placed=(last_placed
                                      if cfg.feature_set == "df" else None),
                )

            self._searches[key] = jax.jit(fn)
        return self._searches[key]

    def play(self, color: str, vertex: str) -> bool:
        a = gtp_to_flat(vertex, self.size)
        want = BLACK if color.lower().startswith("b") else WHITE
        cur = int(np.asarray(self.state.core.to_play)[0])
        if cur != want:
            # GTP allows out-of-turn setup; force to_play
            self.state = self.state._replace(
                core=self.state.core._replace(
                    to_play=jnp.full((1,), want, jnp.int8)
                )
            )
        lm = np.asarray(legal_moves(self.state, self.size))[0]
        if not lm[a]:
            return False
        self.state, info = step(self.state, np.array([a]), self.size)
        if bool(np.asarray(info.illegal)[0]):
            return False
        self.history.append(self.state)
        self._advance(a)
        return True

    def genmove(self, color: str) -> str:
        want = BLACK if color.lower().startswith("b") else WHITE
        cur = int(np.asarray(self.state.core.to_play)[0])
        if cur != want:
            self.state = self.state._replace(
                core=self.state.core._replace(
                    to_play=jnp.full((1,), want, jnp.int8)
                )
            )
        if bool(np.asarray(self.state.terminated)[0]):
            return "pass"
        self.key, k = jax.random.split(self.key)
        if self.tree is None:
            from elf_tpu.search.mcts import fresh_tree

            cap = self.mcts_cfg.max_nodes or (2 * self.mcts_cfg.num_rollouts + 2)
            self.tree = fresh_tree(1, self.size, max(cap, 3), self.state.core)
        res, tree = self._search_fn()(
            self.state.core, self.state.stone_hist, self.state.hist_len,
            self.params, self.batch_stats, k, self.tree,
            self.state.hash_hist_lo, self.state.hash_hist_hi,
            self.state.nhash, self.state.last_placed,
        )
        self.tree = tree
        a = int(np.asarray(res.best_action)[0])
        v = float(np.asarray(res.root_q)[0])
        mover_v = v if want == BLACK else -v
        if self.resign_thres > 0 and mover_v < -1.0 + self.resign_thres:
            return "resign"
        if (
            self.following_pass
            and int(np.asarray(self.state.core.last_move)[0])
            == self.size * self.size
            and mover_v > 0.9
        ):
            from elf_tpu.env.go import state as _gs

            score = float(np.asarray(
                _gs.evaluate(self.state, self.size, self.komi))[0])
            mover_score = score if want == BLACK else -score
            if mover_score > 0:
                a = self.size * self.size  # follow the pass and win
        self.state, _ = step(self.state, np.array([a]), self.size)
        self.history.append(self.state)
        self._advance(a)
        return flat_to_gtp(a, self.size)

    def undo(self) -> bool:
        if len(self.history) < 2:
            return False
        self.history.pop()
        self.state = self.history[-1]
        self.tree = None  # tree no longer matches the position
        return True

    def final_score(self) -> str:
        v = float(np.asarray(gostate.evaluate(self.state, self.size, self.komi))[0])
        if v > 0:
            return f"B+{v:.1f}"
        if v < 0:
            return f"W+{-v:.1f}"
        return "0"

    def showboard(self) -> str:
        stones = np.asarray(self.state.core.stones)[0].reshape(self.size, self.size)
        sym = {0: ".", 1: "X", 2: "O"}
        cols = "ABCDEFGHJKLMNOPQRSTUVWXYZ"[: self.size]
        lines = ["   " + " ".join(cols)]
        for r in range(self.size):
            row = " ".join(sym[int(x)] for x in stones[r])
            lines.append(f"{self.size - r:2d} {row} {self.size - r}")
        lines.append("   " + " ".join(cols))
        return "\n".join(lines)


class GtpConsole:
    """GTP framing loop over stdio (console_lib.py command dispatch)."""

    COMMANDS = [
        "protocol_version", "name", "version", "known_command",
        "list_commands", "quit", "boardsize", "clear_board", "komi",
        "play", "genmove", "undo", "final_score", "showboard",
        "final_status_list", "time_settings", "kgs-time_settings",
        "time_left", "kgs-game_over", "elf-ladder",
    ]

    def __init__(self, engine: GtpEngine, name: str = "elf_tpu",
                 version: str = "0.1"):
        self.engine = engine
        self.name = name
        self.version = version
        self.done = False

    def handle(self, line: str) -> Optional[str]:
        line = line.split("#")[0].strip()
        if not line:
            return None
        parts = line.split()
        cmd_id = ""
        if parts[0].isdigit():
            cmd_id = parts[0]
            parts = parts[1:]
        if not parts:
            return None
        cmd, args = parts[0].lower(), parts[1:]
        try:
            ok, payload = self._dispatch(cmd, args)
        except Exception as e:  # noqa: BLE001
            ok, payload = False, str(e)
        prefix = "=" if ok else "?"
        head = f"{prefix}{cmd_id}" if cmd_id else prefix
        return f"{head} {payload}".rstrip() + "\n"

    def _dispatch(self, cmd: str, args: List[str]) -> Tuple[bool, str]:
        e = self.engine
        if cmd == "protocol_version":
            return True, "2"
        if cmd == "name":
            return True, self.name
        if cmd == "version":
            return True, self.version
        if cmd == "known_command":
            return True, "true" if args and args[0] in self.COMMANDS else "false"
        if cmd == "list_commands":
            return True, "\n".join(self.COMMANDS)
        if cmd == "quit":
            self.done = True
            return True, ""
        if cmd == "boardsize":
            size = int(args[0])
            if size not in (5, 7, 9, 13, 19):
                return False, "unacceptable size"
            e.reset(size)
            return True, ""
        if cmd == "clear_board":
            e.reset()
            return True, ""
        if cmd == "komi":
            e.komi = float(args[0])
            return True, ""
        if cmd == "play":
            if len(args) < 2:
                return False, "syntax error"
            if not e.play(args[0], args[1]):
                return False, "illegal move"
            return True, ""
        if cmd == "genmove":
            if not args:
                return False, "syntax error"
            return True, e.genmove(args[0])
        if cmd == "undo":
            return (True, "") if e.undo() else (False, "cannot undo")
        if cmd == "final_score":
            return True, e.final_score()
        if cmd == "showboard":
            return True, "\n" + e.showboard()
        if cmd == "final_status_list":
            # Tromp-Taylor scoring treats every stone as alive: "dead"
            # is always empty, "alive"/"seki" report accordingly — the
            # answers KGS/gogui need to close a game cleanly
            what = args[0].lower() if args else "dead"
            if what == "dead" or what == "seki":
                return True, ""
            if what == "alive":
                stones = np.asarray(e.state.core.stones)[0]
                verts = [
                    flat_to_gtp(int(i), e.size)
                    for i in np.nonzero(stones)[0]
                ]
                return True, " ".join(verts)
            return False, "syntax error"
        if cmd in ("time_settings", "kgs-time_settings", "time_left"):
            # accepted and recorded; the engine searches with a fixed
            # rollout budget (the reference console also ignores clocks)
            self.time_settings = args
            return True, ""
        if cmd == "kgs-game_over":
            return True, ""
        if cmd == "elf-ladder":
            # extension: model-free ladder read of <color> <vertex> via
            # the native solver (native/ladder.c, the checkLadder
            # counterpart): "capture <depth>", "doomed_escape <depth>",
            # or "none"
            if len(args) < 2:
                return False, "syntax error"
            from elf_tpu.env.go.coords import gtp_to_flat
            from elf_tpu.native.ladder import read_ladder

            color = 1 if args[0].lower().startswith("b") else 2
            mv = gtp_to_flat(args[1], e.size)
            if mv is None or mv >= e.size * e.size:
                return False, "invalid vertex"
            stones = np.asarray(e.state.core.stones)[0]
            ko_active = (
                int(np.asarray(e.state.core.ko_age)[0]) == 0
                and int(np.asarray(e.state.core.ko_point)[0]) >= 0
            )
            kp = (int(np.asarray(e.state.core.ko_point)[0])
                  if ko_active else -1)
            kc = int(np.asarray(e.state.core.ko_color)[0])
            cls, depth = read_ladder(stones, mv, color, e.size, kp, kc)
            return True, "none" if cls == "none" else f"{cls} {depth}"
        return False, "unknown command"

    def run(self, stdin=None, stdout=None) -> None:
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            resp = self.handle(line)
            if resp is not None:
                stdout.write(resp + "\n")
                stdout.flush()
            if self.done:
                return
