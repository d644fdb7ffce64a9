"""Core data containers, registered as JAX pytrees.

Capability parity: reference pig/data.py:28-56 (Clip, RawPair, ClipBatch),
pig/data.py:310-316 (Stats), pig/triplet.py:17-29 and
pig/targeted_triplets.py:19-32 (Triplet, TripletBatch).

Video layout is TPU-native channels-last (T, H, W, C) / batched
(B, T, H, W, C) — the reference uses torch's (C, T, H, W).  Audio is (S,) /
batched (B, S) mono float32.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import numpy as np


@dataclass
class Clip:
    """A video clip with associated audio (reference pig/data.py:28-37)."""
    video: np.ndarray  # (T, H, W, C): uint8 (cached/native pipeline — the
    # encoders fuse /255 on device) or float32 in [0, 1] (decode-on-the-fly)
    audio: np.ndarray  # (S,) float32
    video_duration: float
    audio_duration: float
    filename: str = ""
    offset: Optional[float] = None
    index: Optional[int] = None


@dataclass
class RawSegment:
    """An undecoded segment of a source clip (reference pig/data.py:40-46 RawPair).

    Spans are in seconds relative to the source file; audio and video spans may
    differ (jittered segmentation, reference pig/preprocess.py:105-124).
    """
    path: str
    video_start: float
    video_end: float
    audio_start: float
    audio_end: float
    offset: Optional[float] = None
    meta: Any = None

    @property
    def duration(self) -> float:
        return self.video_end - self.video_start

    @property
    def audio_duration(self) -> float:
        return self.audio_end - self.audio_start


@jax.tree_util.register_pytree_node_class
@dataclass
class ClipBatch:
    """Batch of padded clips (reference pig/data.py:49-56)."""
    video: Any  # (B, T, H, W, C)
    audio: Any  # (B, S)
    video_duration: Any  # (B,) seconds
    audio_duration: Any  # (B,) seconds
    # static-shape bookkeeping (no reference equivalent): valid extents inside
    # the padded buffers, in frames / samples.
    video_frames: Any = None  # (B,) int32
    audio_samples: Any = None  # (B,) int32

    def tree_flatten(self):
        children = (self.video, self.audio, self.video_duration,
                    self.audio_duration, self.video_frames, self.audio_samples)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclass
class Triplet:
    """(anchor audio, positive video, negative video) — reference pig/targeted_triplets.py:19-25."""
    anchor: Any
    positive: Any
    negative: Any
    video_duration: Optional[float] = None
    audio_duration: Optional[float] = None

    def tree_flatten(self):
        return (self.anchor, self.positive, self.negative,
                self.video_duration, self.audio_duration), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclass
class TripletBatch:
    """Padded batch of triplets — reference pig/targeted_triplets.py:28-32."""
    anchor: Any  # (B, S)
    positive: Any  # (B, T, H, W, C)
    negative: Any  # (B, T, H, W, C)

    def tree_flatten(self):
        return (self.anchor, self.positive, self.negative), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@dataclass
class Stats:
    """Mean/std of a data sample (reference pig/data.py:310-316)."""
    video_mean: np.ndarray  # (3,)
    video_std: np.ndarray  # (3,)
    audio_mean: float
    audio_std: float
