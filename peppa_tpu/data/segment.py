"""Clip segmentation: fixed windows, jittered windows, subtitle lines.

Capability parity: reference pig/preprocess.py:59-124 — but operating on
(path, duration, metadata) descriptors instead of decoded moviepy clips, so
segmentation is pure bookkeeping and all decoding happens later (batched, off
the critical path).

Semantics preserved exactly:
- `segment`: non-overlapping windows of `duration` seconds while the window
  fits (reference pig/preprocess.py:92-103).
- `segment_jitter`: per window, independent audio-span and video-span lengths
  ~ N(duration, sd) clamped to [0.05, 6.0] s, both centered on the window
  midpoint and clipped to the source extent — audio and video deliberately
  cover different extents (reference pig/preprocess.py:105-124).
- `lines`: split at subtitle boundaries from the sidecar JSON, offsets
  relative to the first subtitle, end clamped to the clip, lines starting past
  the end skipped; timestamps truncated to whole seconds exactly like the
  reference's pd.Timedelta(...).seconds (reference pig/preprocess.py:59-72).
"""

from __future__ import annotations

import logging
import math
import random
from typing import Dict, Iterator, List, Optional

from peppa_tpu.data.types import RawSegment

JITTER_MIN_S = 0.05
JITTER_MAX_S = 6.0


def segment(path: str, clip_duration: float, duration: float = 3.2,
            jitter: bool = False, jitter_sd: Optional[float] = None,
            rng: Optional[random.Random] = None) -> Iterator[RawSegment]:
    """Fixed or jittered non-overlapping windows over [0, clip_duration]."""
    if jitter:
        yield from segment_jitter(path, clip_duration, duration,
                                  sd=jitter_sd, rng=rng)
        return
    start = 0.0
    end = start + duration
    while end <= clip_duration:
        yield RawSegment(path=path, video_start=start, video_end=end,
                         audio_start=start, audio_end=end, offset=start)
        start = end
        end = end + duration


def segment_jitter(path: str, clip_duration: float, duration: float = 3.2,
                   sd: Optional[float] = 1.0,
                   rng: Optional[random.Random] = None) -> Iterator[RawSegment]:
    """Windows with independently jittered audio/video spans around each midpoint."""
    if sd is None:
        sd = 1.0
    rng = rng or random
    start = 0.0
    end = start + duration
    while end <= clip_duration:
        size_a = min(JITTER_MAX_S, max(JITTER_MIN_S,
                                       duration + rng.normalvariate(0.0, sd)))
        size_v = min(JITTER_MAX_S, max(JITTER_MIN_S,
                                       duration + rng.normalvariate(0.0, sd)))
        mid = end - (end - start) / 2
        a0 = max(0.0, mid - size_a / 2)
        a1 = min(clip_duration, mid + size_a / 2)
        v0 = max(0.0, mid - size_v / 2)
        v1 = min(clip_duration, mid + size_v / 2)
        yield RawSegment(path=path, video_start=v0, video_end=v1,
                         audio_start=a0, audio_end=a1, offset=start)
        start = end
        end = end + duration


def _total_seconds(value: str) -> float:
    import pandas as pd

    return float(pd.Timedelta(value).total_seconds())


def lines(path: str, clip_duration: float, metadata: Dict) -> Iterator[RawSegment]:
    """Split a clip at its subtitle boundaries (reference pig/preprocess.py:59-72).

    The reference computes (Timedelta(line) - Timedelta(first)).seconds —
    i.e. the *difference* truncated to whole seconds — which we reproduce.
    """
    subs = metadata["subtitles"]
    if not subs:
        return
    start = _total_seconds(subs[0]["begin"])
    for line in subs:
        begin = float(math.floor(_total_seconds(line["begin"]) - start))
        end = min(clip_duration,
                  float(math.floor(_total_seconds(line["end"]) - start)))
        if begin < clip_duration:
            yield RawSegment(path=path, video_start=begin, video_end=end,
                             audio_start=begin, audio_end=end, offset=begin,
                             meta=line)
        else:
            logging.warning("Line %s starts past end of clip %s", line, path)
