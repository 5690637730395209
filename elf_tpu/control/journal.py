"""On-disk record journaling for the training server.

Reference behavior: accepted self-play records are additionally journaled
to disk in chunks of ~1000 games so a restarted server can rebuild its
replay buffer (`RecordBuffer::saveCurrent`, ctrl_selfplay.h:233, invoked
from the data plane at game_ctrl.h:313-314).  Here: accepted records
append to `records-<chunk>.jsonl` under the journal directory, rotating
every `rotate_every` records; `replay_into` refills a record sink (the
replay buffer / training pipeline) from all journal files on resume —
closing the reference's "replay buffer is not checkpointed" gap.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Callable, List

from elf_tpu.selfplay.records import Record


class RecordJournal:
    def __init__(self, directory: str, rotate_every: int = 1000):
        self.directory = directory
        self.rotate_every = rotate_every
        self._lock = threading.Lock()
        os.makedirs(directory, exist_ok=True)
        # resume numbering after existing chunks
        existing = self._chunks()
        self._chunk = (max(existing) + 1) if existing else 0
        self._count = 0
        self._fh = None

    def _chunks(self) -> List[int]:
        out = []
        for f in os.listdir(self.directory):
            if f.startswith("records-") and f.endswith(".jsonl"):
                try:
                    out.append(int(f[len("records-"):-len(".jsonl")]))
                except ValueError:
                    pass
        return out

    def _path(self, chunk: int) -> str:
        return os.path.join(self.directory, f"records-{chunk}.jsonl")

    def append(self, record: Record) -> None:
        with self._lock:
            if self._fh is None:
                self._fh = open(self._path(self._chunk), "a")
            self._fh.write(json.dumps(record.to_json()) + "\n")
            self._count += 1
            if self._count >= self.rotate_every:
                self._fh.flush()
                self._fh.close()
                self._fh = None
                self._chunk += 1
                self._count = 0

    def flush(self) -> None:
        with self._lock:
            if self._fh is not None:
                self._fh.flush()

    def close(self) -> None:
        with self._lock:
            if self._fh is not None:
                self._fh.close()
                self._fh = None

    def replay_into(self, sink: Callable[[Record], None]) -> int:
        """Feed every journaled record to `sink` (resume path). Returns the
        number of records replayed."""
        n = 0
        for chunk in sorted(self._chunks()):
            path = self._path(chunk)
            with open(path) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    sink(Record.from_json(json.loads(line)))
                    n += 1
        return n
