"""Offline data loading: bulk SGF / record-JSON files -> replay pipeline.

Counterpart of the reference offline modes (`/root/reference/src_cpp/
elfgames/go/train/distri_server.h:74` DataOfflineLoaderJSON: list_files +
16-thread JSON load; and the `offline_train` mode replaying SGF archives):
loads record-JSON lines or SGF game files concurrently into the
TrainingPipeline for supervised training (`df_pred`: predict the human
move, value from the game result).
"""

from __future__ import annotations

import concurrent.futures
import json
import os
from typing import Iterable, List, Optional

import numpy as np

from elf_tpu.logging_utils import get_indexed_logger
from elf_tpu.selfplay.records import Record, make_record
from elf_tpu.sgf import parse_sgf
from elf_tpu.training.pipeline import TrainingPipeline


def record_from_sgf(text: str, expected_size: Optional[int] = None
                    ) -> Optional[Record]:
    """One SGF game -> a Record with one-hot per-move policies and the
    game result as reward (supervised df_pred semantics)."""
    from elf_tpu.native.sgf_codec import parse_sgf_main

    parsed = parse_sgf_main(text)  # native fast path (bulk loading)
    if parsed is not None:
        moves, size, _komi, _handicap, result_str = parsed
    else:
        try:
            game = parse_sgf(text)
        except ValueError:
            return None
        size = game.board_size
        moves = [m for _, m in game.main_moves()]
        result_str = game.result
    if expected_size and size != expected_size:
        return None
    if not moves:
        return None
    A = size * size + 1
    policies = []
    for m in moves:
        p = np.zeros((A,), np.float32)
        p[m] = 1.0
        policies.append(p)
    result = result_str.upper()
    reward = 1.0 if result.startswith("B") else -1.0
    rec = make_record(moves, reward, policies, [0.0] * len(moves), size)
    rec.offline = True
    return rec


def iter_record_json(path: str) -> Iterable[Record]:
    """Record-JSON file: one JSON object per line, or a JSON list."""
    with open(path) as f:
        head = f.read(1)
        f.seek(0)
        if head == "[":
            for d in json.load(f):
                yield Record.from_json(d)
        else:
            for line in f:
                line = line.strip()
                if line:
                    yield Record.from_json(json.loads(line))


class OfflineLoader:
    """Concurrent bulk loader (DataOfflineLoaderJSON's 16-thread load)."""

    def __init__(self, pipeline: TrainingPipeline, num_threads: int = 16):
        self.pipeline = pipeline
        self.num_threads = num_threads
        self.logger = get_indexed_logger("training.OfflineLoader-")

    def load_paths(self, paths: List[str]) -> int:
        loaded = 0

        def load_one(path: str) -> List[Record]:
            out = []
            if path.endswith(".sgf"):
                with open(path) as f:
                    rec = record_from_sgf(f.read(), self.pipeline.size)
                if rec is not None:
                    out.append(rec)
            else:
                try:
                    out.extend(iter_record_json(path))
                except (OSError, ValueError, json.JSONDecodeError) as e:
                    self.logger.warning("skipping %s: %s", path, e)
            return out

        with concurrent.futures.ThreadPoolExecutor(self.num_threads) as ex:
            for recs in ex.map(load_one, paths):
                for r in recs:
                    self.pipeline.insert_record(r)
                    loaded += 1
        self.logger.info("loaded %d records from %d files", loaded, len(paths))
        return loaded

    def load_dir(self, directory: str, limit: Optional[int] = None) -> int:
        paths = sorted(
            os.path.join(directory, f)
            for f in os.listdir(directory)
            if f.endswith((".sgf", ".json", ".jsonl"))
        )
        if limit:
            paths = paths[:limit]
        return self.load_paths(paths)
