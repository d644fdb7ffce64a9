"""Shared request-batching primitives for the serving surfaces.

EncoderService (serving.py, live model) and ExportedEncoders (export.py,
AOT StableHLO artifacts) present the same contract — variable-length
requests grouped by duration bucket, zero-padded to the bucket's static
shape, batched to a fixed batch size, video canonicalized to uint8 — so the
semantics-bearing pieces live here once: a drift between the live path and
the exported path would silently change what an exported artifact computes.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np


def canonicalize_video(x) -> np.ndarray:
    """Clip -> uint8 (the only video dtype the compiled programs accept).

    Float inputs are treated as [0, 1] and quantized; uint8 passes through.
    Canonicalizing BEFORE bucketing matters: a float request would otherwise
    pay an XLA compile at serving time (only the uint8 program is warmed
    up), and a bucket mixing dtypes would truncate float values via
    astype-on-assignment into the uint8 batch slab.
    """
    x = np.asarray(x)
    if x.dtype == np.uint8:
        return x
    return np.clip(np.rint(x * 255.0), 0, 255).astype(np.uint8)


def group_by_bucket(items: Sequence[np.ndarray],
                    bucket_of: Callable[[np.ndarray], int]
                    ) -> Dict[int, List[int]]:
    """Item indices grouped by their bucket size, preserving arrival order."""
    by_bucket: Dict[int, List[int]] = {}
    for i, item in enumerate(items):
        by_bucket.setdefault(bucket_of(item), []).append(i)
    return by_bucket


def padded_chunk(items: Sequence[np.ndarray], chunk: Sequence[int],
                 size: int, batch_size: int, trailing_shape, dtype
                 ) -> np.ndarray:
    """Assemble one zero-padded (batch_size, size, *trailing) request batch.

    Overlong items crop to the bucket (callers route items to the LARGEST
    bucket first, so this only triggers for inputs beyond every bucket).
    """
    batch = np.zeros((batch_size, size) + tuple(trailing_shape), dtype)
    for row, i in enumerate(chunk):
        n = min(items[i].shape[0], size)
        batch[row, :n] = items[i][:n]
    return batch
