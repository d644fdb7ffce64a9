"""Process-level distributed topology helpers (multi-host SPMD).

The reference is single-host (SURVEY.md §2.10); these helpers make the
training loop and data module coherent on a multi-host slice: exactly one
process writes artifacts, and every process contributes its local slab of
each global batch.

Kept as module-level functions (called through the module, not imported
names) so tests can monkeypatch `process_index`/`process_count` to simulate
a multi-host topology on one machine.
"""

from __future__ import annotations


def process_index() -> int:
    import jax

    try:
        return jax.process_index()
    except Exception:
        return 0


def process_count() -> int:
    import jax

    try:
        return jax.process_count()
    except Exception:
        return 1


def is_main_process() -> bool:
    """True on exactly one process; gates checkpoint/metric/hparams writes."""
    return process_index() == 0
