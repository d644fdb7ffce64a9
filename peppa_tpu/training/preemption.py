"""Graceful preemption handling for cluster-scheduled training.

The reference runs under SLURM job arrays (jobarray.sh:1-13) with no
preemption story: a SIGTERM from the scheduler kills the Lightning process
mid-step and loses everything since the last epoch-boundary checkpoint.
Production TPU pools preempt constantly, so the Trainer arms a
`PreemptionGuard` around the step loop: on SIGTERM/SIGUSR1 (the signals
SLURM's `--signal` delivers before the time limit, configurable via
`tpu.preempt_signals`) the handler only sets a flag; the loop notices at
the next step boundary, writes a full resumable checkpoint
(`checkpoints/preempted.ckpt`) and returns cleanly so the job can be
requeued and resumed with `--resume_from .../preempted.ckpt`.

Signal handlers can only be installed from the main thread; anywhere else
(e.g. a Trainer driven from a worker thread) the guard degrades to
never-triggered rather than failing.
"""

from __future__ import annotations

import logging
import signal
import threading
from typing import Optional, Sequence


class PreemptionGuard:
    """Context manager: arm signal handlers, expose a `triggered` flag.

    The handler is async-signal-safe by doing nothing but setting an event;
    all checkpointing happens on the training thread at a step boundary,
    where the model state is consistent.  Previous handlers are restored on
    exit so nested/sequential trainers behave.
    """

    def __init__(self, signals: Sequence[str] = ("SIGTERM", "SIGUSR1")):
        self._names = list(signals)
        self._event = threading.Event()
        self._prev: dict = {}
        self.signame: Optional[str] = None

    def __enter__(self) -> "PreemptionGuard":
        for name in self._names:
            signum = getattr(signal, name, None)
            if signum is None:
                logging.warning("preemption: unknown signal %r ignored", name)
                continue
            try:
                self._prev[signum] = signal.signal(signum, self._handle)
            except ValueError:
                # not the main thread of the main interpreter
                logging.warning(
                    "preemption: cannot install %s handler off the main "
                    "thread; guard disabled", name)
                break
        return self

    def __exit__(self, *exc) -> bool:
        for signum, prev in self._prev.items():
            try:
                signal.signal(signum, prev)
            except ValueError:  # pragma: no cover - same thread constraint
                pass
        self._prev.clear()
        return False

    def _handle(self, signum, frame) -> None:
        if self.signame is None:  # record the FIRST triggering signal
            self.signame = signal.Signals(signum).name
        self._event.set()

    @property
    def triggered(self) -> bool:
        return self._event.is_set()
