"""Profiling & step timing: jax.profiler traces + throughput accounting.

The reference has no profiling at all (SURVEY.md §5.1 — only a wall-clock
budget); on TPU this is first-class: `trace(dir)` wraps a region in a
`jax.profiler` trace viewable in TensorBoard/XProf/Perfetto, and `StepTimer`
tracks steps/sec + pairs/sec with warm-up exclusion, for the Trainer's logs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace over the wrapped region; no-op when dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-region inside an active trace (shows up in the timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Steps/sec + items/sec with warm-up exclusion (compile steps skew rates)."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self) -> None:
        self._count = 0
        self._items = 0
        self._t0: Optional[float] = None
        self._last: Optional[float] = None

    def step(self, items: int = 0) -> None:
        now = time.perf_counter()
        self._count += 1
        if self._count == self.warmup_steps + 1:
            self._t0 = now
            self._items = 0
        if self._count > self.warmup_steps:
            self._items += items
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self._last is None or self._last <= self._t0:
            return 0.0
        return (self._count - self.warmup_steps - 1) / (self._last - self._t0)

    @property
    def items_per_sec(self) -> float:
        if self._t0 is None or self._last is None or self._last <= self._t0:
            return 0.0
        return self._items / (self._last - self._t0)

    def metrics(self, prefix: str = "perf/") -> Dict[str, float]:
        return {f"{prefix}steps_per_sec": self.steps_per_sec,
                f"{prefix}items_per_sec": self.items_per_sec}
