#!/usr/bin/env python
"""Dump the reference ladder_suite probe positions as flat-move lines for
`gen_ladder_golden stdin`: "<upto> <f1> <f2> ... <fn>" per probe, where
`upto` replays to the position just BEFORE and just AFTER each listed
probe move (ladder_list + ladder_magic_list, README.rst:173)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from elf_tpu.tools.ladder import load_moves  # noqa: E402

SUITE = "/root/reference/ladder_suite"


def main():
    seen = set()
    for list_name in ("ladder_list", "ladder_magic_list"):
        path = os.path.join(SUITE, list_name)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 2:
                    continue
                sgf, n = parts[0], int(parts[1])
                moves, size = load_moves(os.path.join(SUITE, "ladder", sgf))
                if size != 19:
                    continue
                for upto in (n - 1, n):
                    if 0 <= upto <= len(moves) and (sgf, upto) not in seen:
                        seen.add((sgf, upto))
                        print(upto, " ".join(map(str, moves)))


if __name__ == "__main__":
    main()
