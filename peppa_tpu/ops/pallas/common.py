"""Shared helpers for the Pallas TPU kernels."""

from __future__ import annotations

import functools

import jax


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (incl. tunneled plugins)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def use_pallas(enable: bool = True, interpret: bool = False) -> bool:
    """Whether the Pallas path should run: enabled and (TPU or interpreter)."""
    return enable and (interpret or on_tpu())
