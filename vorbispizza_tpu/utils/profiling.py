"""Profiling hooks — a new capability over the reference (SURVEY.md §5:
the reference exposes only IStreamStats bit accounting; here decode runs
can additionally capture an XLA device trace).

    with device_trace("/tmp/vorbis-trace"):
        decode_corpus(paths)

produces a TensorBoard-compatible trace of every fused decode program
and transfer.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def device_trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class DecodeTimer:
    """Wall-clock accounting of pipeline stages (host front end vs device),
    the batch analog of the reference's StreamStats bitrate accounting.
    ``counters`` accumulates quantities (e.g. h2d/d2h bytes) alongside the
    stage walls. Stages may overlap (the corpus pipeline dispatches chunks
    while front ends still run), so stage walls need not sum to the total."""

    stages: dict = field(default_factory=dict)
    counters: dict = field(default_factory=dict)
    #: optional event timeline [(name, t_rel_s)] — mark() is a no-op until
    #: the first mark of a run establishes t0, so steady-state users pay
    #: one lock + append per event only when a caller asked for a timeline
    events: list = field(default_factory=list)
    _t0: float = 0.0
    # stages run concurrently (the corpus collector pool finishes chunks on
    # worker threads); accumulation must be atomic
    _lock: object = field(default_factory=__import__("threading").Lock)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.stages[name] = self.stages.get(name, 0.0) + dt

    def mark(self, name: str) -> None:
        """Append a timestamped event (seconds since the timer's first
        mark). The corpus pipeline marks dispatch/pull boundaries per
        chunk, giving the overlap timeline that aggregate stage walls
        (which overlap) cannot show."""
        t = time.perf_counter()
        with self._lock:
            if not self.events:
                self._t0 = t
            self.events.append((name, round(t - self._t0, 4)))

    def count(self, name: str, value) -> None:
        with self._lock:
            self.counters[name] = self.counters.get(name, 0) + value

    def report(self) -> dict:
        out = dict(self.stages)
        out.update(self.counters)
        return out
