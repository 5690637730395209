"""Tracing / profiling hooks (SURVEY §5 aux subsystem).

The reference has only in-tree stage timers (`RLTimer`, trainer/timer.py:12;
`elf_utils::MyClock`, utils/utils.h:183, used for `--mcts_verbose_time`
move timing in elf/ai/tree_search/mcts.h:62).  The TPU-native equivalent
is the XLA/JAX profiler: device traces viewable in TensorBoard/Perfetto,
plus named host-side annotations so self-play / train / eval phases are
attributable in the timeline.

Usage:
    prof = Profiler(trace_dir="/tmp/trace")   # or trace_dir="" to disable
    with prof.trace():                        # one profiler session
        with prof.phase("selfplay"):          # named timeline region
            actor.play_moves(...)
        with prof.phase("train"):
            runner.run_minibatch()
    prof.report()                             # per-phase wall-time summary

All hooks are no-ops when trace_dir is empty, so call sites can stay
unconditional.  `phase()` also feeds an `RLTimer`, giving the reference's
stage-timer behavior even when full tracing is off.
"""

from __future__ import annotations

import contextlib
from typing import Optional

from elf_tpu.stats import RLTimer


class Profiler:
    def __init__(self, trace_dir: str = "", with_device_trace: bool = True):
        """trace_dir: where to write the jax.profiler session ('' = timers
        only).  with_device_trace: include device (TPU) events, not just
        host annotations."""
        self.trace_dir = trace_dir
        self.with_device_trace = with_device_trace
        self.timer = RLTimer()
        self._active = False

    @contextlib.contextmanager
    def trace(self):
        """One profiler session around a region of work."""
        if not self.trace_dir:
            yield
            return
        import jax

        jax.profiler.start_trace(self.trace_dir)
        self._active = True
        try:
            yield
        finally:
            self._active = False
            jax.profiler.stop_trace()

    @contextlib.contextmanager
    def phase(self, name: str):
        """Named region: shows up in the device timeline (TraceAnnotation)
        and in the host stage timer."""
        self.timer.record(f"before_{name}")
        if self.trace_dir:
            import jax

            cm = jax.profiler.TraceAnnotation(name)
        else:
            cm = contextlib.nullcontext()
        with cm:
            yield
        self.timer.record(name)

    def annotate_fn(self, name: str, fn):
        """Wrap fn so every call is a named trace region."""
        def wrapped(*a, **k):
            with self.phase(name):
                return fn(*a, **k)

        return wrapped

    def report(self) -> str:
        return "profile: " + self.timer.print()
