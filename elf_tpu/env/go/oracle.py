"""Pure-Python scalar Go engine used as a *test oracle*.

This is a deliberately simple, independent implementation of the same rules
as `engine.py` (and the reference `board.cc` / `go_state.cc`): explicit BFS
flood fills, python sets, no cleverness.  It exists so the vectorized JAX
engine can be validated against an implementation whose correctness is
obvious by inspection.  Never used on any hot path.
"""

from __future__ import annotations

from collections import deque
from typing import List, Optional, Set, Tuple

EMPTY, BLACK, WHITE = 0, 1, 2


class OracleGo:
    def __init__(self, size: int = 19):
        self.size = size
        self.n2 = size * size
        self.reset()

    def reset(self):
        self.stones: List[int] = [EMPTY] * self.n2
        self.to_play = BLACK
        self.ko_point: Optional[int] = None
        self.ko_color = 0
        self.ko_age = 10_000
        self.ply = 0
        self.passes = 0
        self.last_move = -1
        self.history_boards: List[Tuple[int, ...]] = []  # pre-move snapshots
        self.superko = False

    # -- helpers ------------------------------------------------------------
    def neighbors(self, p: int):
        r, c = divmod(p, self.size)
        if r > 0:
            yield p - self.size
        if r < self.size - 1:
            yield p + self.size
        if c > 0:
            yield p - 1
        if c < self.size - 1:
            yield p + 1

    def chain_and_libs(self, p: int) -> Tuple[Set[int], Set[int]]:
        color = self.stones[p]
        assert color != EMPTY
        chain, libs = {p}, set()
        q = deque([p])
        while q:
            x = q.popleft()
            for n in self.neighbors(x):
                if self.stones[n] == color and n not in chain:
                    chain.add(n)
                    q.append(n)
                elif self.stones[n] == EMPTY:
                    libs.add(n)
        return chain, libs

    # -- rules --------------------------------------------------------------
    def is_legal(self, action: int) -> bool:
        if self.terminated():
            return False
        if action == self.n2:
            return True
        p = action
        if self.stones[p] != EMPTY:
            return False
        if (
            self.ko_point == p
            and self.ko_age == 0
            and self.to_play == self.ko_color
        ):
            return False
        # simulate placement
        color, opp = self.to_play, 3 - self.to_play
        self.stones[p] = color
        try:
            # captures?
            for n in self.neighbors(p):
                if self.stones[n] == opp:
                    _, libs = self.chain_and_libs(n)
                    if not libs:
                        return True  # capturing move is never suicide
            _, libs = self.chain_and_libs(p)
            return bool(libs)
        finally:
            self.stones[p] = EMPTY

    def legal_moves(self) -> List[bool]:
        return [self.is_legal(a) for a in range(self.n2 + 1)]

    def play(self, action: int) -> bool:
        """Returns False (and leaves state unchanged) on illegal moves."""
        if self.terminated():
            return False
        if action == self.n2:  # pass
            self.passes += 1
            self.ko_age += 1
            self.ply += 1
            self.last_move = action
            self.to_play = 3 - self.to_play
            return True
        if not self.is_legal(action):
            return False

        pre = tuple(self.stones)
        p = action
        color, opp = self.to_play, 3 - self.to_play
        self.stones[p] = color
        captured: Set[int] = set()
        for n in self.neighbors(p):
            if self.stones[n] == opp:
                chain, libs = self.chain_and_libs(n)
                if not libs:
                    captured |= chain
        for q in captured:
            self.stones[q] = EMPTY

        chain, libs = self.chain_and_libs(p)
        if len(chain) == 1 and len(libs) == 1 and len(captured) == 1:
            self.ko_point = next(iter(captured))
            self.ko_color = opp
            self.ko_age = 0
        else:
            self.ko_age += 1

        # superko: position recurring (positional, pre-move history)
        self.history_boards.append(pre)
        if tuple(self.stones) in self.history_boards:
            self.superko = True

        self.passes = 0
        self.ply += 1
        self.last_move = action
        self.to_play = opp
        return True

    def terminated(self) -> bool:
        # reference _ply is 1-based: getPly() >= 2*N^2 <=> moves >= 2*N^2 - 1
        return (
            self.passes >= 2 or self.ply >= 2 * self.n2 - 1 or self.superko
        )

    def score_tt(self) -> int:
        def reach(color: int) -> Set[int]:
            seen = {p for p in range(self.n2) if self.stones[p] == color}
            q = deque(seen)
            while q:
                x = q.popleft()
                for n in self.neighbors(x):
                    if n not in seen and self.stones[n] in (EMPTY, color):
                        if self.stones[n] == EMPTY:
                            seen.add(n)
                            q.append(n)
            # include stones only of own color; empty reached cells
            return seen

        rb, rw = reach(BLACK), reach(WHITE)
        black_v = sum(1 for p in range(self.n2) if p in rb and p not in rw)
        white_v = sum(1 for p in range(self.n2) if p in rw and p not in rb)
        return black_v - white_v

    def evaluate(self, komi: float = 7.5) -> float:
        if self.superko:
            return 1.0 if self.to_play == BLACK else -1.0
        return float(self.score_tt()) - komi
