"""Self-play client: actor loop + record shipping + model-version control.

Counterpart of `/root/reference/src_cpp/elfgames/go/train/distri_client.h`:
 - `ThreadedWriterCtrl` (distri_client.h:10): ship finished-game Records to
   the server, parse the `MsgRequest` reply (model versions + client ctrl),
   throttle when idle;
 - the dispatcher broadcast (`OnReceive` restart decision matrix,
   game_selfplay.cc:222) collapses to: when the requested version changes,
   reload checkpoint params and (for a changed job type) restart games;
 - model loads come from the shared checkpoint directory on demand
   (selfplay.py:138 semantics), with retry.

The client owns one `SelfplayActor` (a [B]-board lockstep shard — the
counterpart of a whole 32-thread reference client process).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

from elf_tpu.config import ControlOptions
from elf_tpu.control.transport import ControlClient, make_identity
from elf_tpu.logging_utils import get_indexed_logger
from elf_tpu.selfplay.actor import SelfplayActor
from elf_tpu.selfplay.records import MsgRequest, Records, ThreadState


class SelfplayClient:
    def __init__(
        self,
        opts: ControlOptions,
        actor: SelfplayActor,
        load_params_fn: Callable[[int], tuple],
        port: Optional[int] = None,
    ):
        """load_params_fn(version) -> (params, batch_stats); called on
        version changes (with retries, selfplay.py:146)."""
        self.opts = opts
        self.actor = actor
        self.load_params_fn = load_params_fn
        self.identity = make_identity()
        self.transport = ControlClient(
            opts.server_addr, port if port is not None else opts.port,
            identity=self.identity,
        )
        self.logger = get_indexed_logger("control.SelfplayClient-")
        self.request = MsgRequest()  # waiting: black_ver = -1
        self.params = None
        self.batch_stats = None
        self.loaded_ver = -1

    # -- control round trips ------------------------------------------------

    def _ship(self, records) -> Optional[MsgRequest]:
        states = {
            b: ThreadState(
                thread_id=b,
                seq=int(self.actor.seqs[b]),
                move_idx=len(self.actor.moves[b]),
                black=self.request.vers.black_ver,
                white=self.request.vers.white_ver,
            )
            for b in range(self.actor.cfg.batch)
        }
        blob = Records(
            identity=self.identity, states=states, records=records
        ).to_json_string()
        reply = self.transport.send("content", blob)
        if reply is None:
            return None
        return MsgRequest.from_json(reply)

    def _maybe_reload(self, req: MsgRequest) -> None:
        ver = req.vers.black_ver
        if ver >= 0 and ver != self.loaded_ver:
            for attempt in range(60):
                try:
                    self.params, self.batch_stats = self.load_params_fn(ver)
                    self.loaded_ver = ver
                    self.logger.info("loaded model version %d", ver)
                    break
                except (OSError, ValueError) as e:
                    self.logger.warning(
                        "model load %d failed (%s); retry %d", ver, e, attempt
                    )
                    time.sleep(2.0)
        self.request = req
        # propagate dynamic resign parameters to the actor (runtime args,
        # not baked into the jitted move_fn)
        self.actor.resign_thres = req.client_ctrl.resign_thres
        self.actor.never_resign_prob = req.client_ctrl.never_resign_prob

    # -- main loop ----------------------------------------------------------

    def run(
        self,
        moves_per_round: int = 16,
        max_rounds: Optional[int] = None,
        stop_fn: Optional[Callable[[], bool]] = None,
    ) -> None:
        rounds = 0
        pending = []
        while max_rounds is None or rounds < max_rounds:
            if stop_fn and stop_fn():
                return
            rounds += 1
            if self.request.vers.wait():
                # no job yet: poll the server (idle throttle,
                # distri_client.h:97)
                req = self._ship(pending)
                pending = []
                if req is not None:
                    self._maybe_reload(req)
                if self.request.vers.wait():
                    time.sleep(1.0)
                continue
            recs = self.actor.play_moves(
                self.params, self.batch_stats, moves_per_round,
                request=self.request,
            )
            pending.extend(recs)
            req = self._ship(pending)
            if req is not None:
                pending = []
                self._maybe_reload(req)
            else:
                # server unreachable: keep records, back off
                # (15-min resend watchdog analog, distri_client.h:42)
                time.sleep(5.0)
