"""Preprocessing tests: episode extraction, segmentation semantics."""

import json
import os
import random

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from peppa_tpu.data import decode as D
from peppa_tpu.data.segment import (
    JITTER_MAX_S,
    JITTER_MIN_S,
    lines,
    segment,
    segment_jitter,
)


def test_segment_fixed_windows():
    segs = list(segment("x.npz", clip_duration=7.0, duration=2.3))
    assert len(segs) == 3
    assert segs[0].video_start == 0.0
    assert segs[0].video_end == pytest.approx(2.3)
    assert segs[2].video_end <= 7.0
    for s in segs:
        assert s.audio_start == s.video_start  # fixed mode: same spans


def test_segment_jitter_clamps_and_independence():
    rng = random.Random(0)
    segs = list(segment_jitter("x.npz", clip_duration=60.0, duration=2.3,
                               sd=5.0, rng=rng))
    assert segs
    diff = 0
    for s in segs:
        for d in (s.duration, s.audio_duration):
            assert d <= JITTER_MAX_S + 1e-9
            assert d >= JITTER_MIN_S - 1e-9
        if abs(s.duration - s.audio_duration) > 1e-6:
            diff += 1
        # both spans centered on the same midpoint (away from the clip
        # edges, where clamping to the source extent shifts them)
        if (min(s.video_start, s.audio_start) > 0
                and max(s.video_end, s.audio_end) < 60.0):
            mid_v = (s.video_start + s.video_end) / 2
            mid_a = (s.audio_start + s.audio_end) / 2
            assert mid_v == pytest.approx(mid_a, abs=1e-6)
    assert diff > len(segs) // 2  # audio/video spans drawn independently


def test_lines_splits_at_subtitles():
    meta = {"subtitles": [
        {"begin": "00:00:01.500", "end": "00:00:03.200", "text": "a"},
        {"begin": "00:00:03.200", "end": "00:00:06.900", "text": "b"},
        {"begin": "00:00:59.000", "end": "00:01:02.000", "text": "late"},
    ]}
    segs = list(lines("x.npz", clip_duration=10.0, metadata=meta))
    assert len(segs) == 2  # the late line starts past the clip end
    assert segs[0].video_start == 0.0  # relative to the first subtitle
    assert segs[0].video_end == pytest.approx(1.0)  # floor(3.2 - 1.5)
    assert segs[1].video_start == pytest.approx(1.0)
    assert segs[1].video_end == pytest.approx(5.0)


def test_extract_from_episode(tmp_path, rng):
    from peppa_tpu.preprocess.extract import extract_from_episode

    # synthetic "episode" as an .npz media file (decode backend-free)
    sr, fps, dur = 800, 25, 12.0
    episode = str(tmp_path / "episode.npz")
    D.save_clip_npz(episode,
                    (rng.uniform(size=(int(dur * fps), 40, 60, 3)) * 255)
                    .astype(np.uint8),
                    rng.normal(size=(int(dur * sr),)).astype(np.float32),
                    fps=fps, sample_rate=sr)
    annotation = {
        "id": 7, "title": "test",
        "narrator_splits": [{
            "context": {"tokenized": [
                {"token": "hi", "begin": "00:00:01", "end": "00:00:02"},
                {"token": "pig", "begin": "00:00:02", "end": "00:00:04"}],
                "subtitles": []},
            "narration": {"tokenized": [
                {"token": "peppa", "begin": "00:00:05", "end": "00:00:08"}],
                "subtitles": []},
        }],
    }
    data_dir = str(tmp_path / "data")
    extract_from_episode(annotation, episode, (60, 40), data_dir=data_dir)
    dialog = os.path.join(data_dir, "out", "60x40", "dialog", "7", "0.npz")
    narr = os.path.join(data_dir, "out", "60x40", "narration", "7", "0.npz")
    assert os.path.exists(dialog) and os.path.exists(narr)
    clip = D.load_clip_npz(dialog)
    # 3 s span at 10 fps -> ~30 frames
    assert 25 <= clip.video.shape[0] <= 31
    # extraction resamples audio to the 44.1 kHz master rate
    assert clip.audio.shape[0] == pytest.approx(3 * 44100, abs=4410)
    # sidecar metadata json written
    assert os.path.exists(os.path.join(data_dir, "out", "60x40", "dialog",
                                       "7", "0.json"))
