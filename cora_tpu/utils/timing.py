"""Timing and profiling utilities.

Parity with the reference's observability (SURVEY.md §5): wall-clock
phase timers around solves (`paper_experiments.cpp:631-641`) and the
per-iteration histories already carried in `TNTResult`; plus the
TPU-native additions — `jax.profiler` trace capture and named scopes
visible in xprof.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulating named phase timer.

    >>> timer = PhaseTimer()
    >>> with timer("solve"):
    ...     ...
    >>> timer.report()
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.time()
        try:
            # annotate the phase in device traces too (no-op outside an
            # active `profiler_trace` capture) so wall-clock phases and
            # xprof timelines line up
            with named_scope(name):
                yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = [
            f"{name:30} {self.totals[name]:9.3f}s  ({self.counts[name]}x)"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Capture a jax.profiler trace (view with xprof/TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def named_scope(name: str):
    """Named annotation visible in device traces."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
