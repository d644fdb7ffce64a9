"""Iterable-dataset path over a synthetic episode tree: glob -> segment ->
decode -> cache -> stats."""

import os

import numpy as np
import pytest

from peppa_tpu.data.dataset import PeppaPigDataset, PeppaPigIterableDataset
from peppa_tpu.data.stats import compute_stats
from peppa_tpu.data.synthetic import make_synthetic_episode_tree

TS = (64, 48)
SR = 8000


@pytest.fixture()
def tree(tmp_path):
    data_dir = str(tmp_path / "data")
    make_synthetic_episode_tree(data_dir, target_size=TS,
                                fragment_type="dialog", episodes=(1, 2, 197),
                                clips_per_episode=2, clip_seconds=7.0,
                                sample_rate=SR)
    return data_dir


def test_iterable_fixed_duration(tree):
    ds = PeppaPigIterableDataset(split=["train"], target_size=TS,
                                 fragment_type="dialog", duration=2.0,
                                 audio_sample_rate=SR, data_dir=tree)
    clips = list(ds)
    # episodes 1,2 are train (dialog train = 1..196); 2 clips x 3 windows
    assert len(clips) == 2 * 2 * 3
    for c in clips:
        assert c.video.shape == (20, TS[1], TS[0], 3)
        assert c.audio.shape == (2 * SR,)
        assert c.video_duration == pytest.approx(2.0)


def test_iterable_lines_mode(tree):
    ds = PeppaPigIterableDataset(split=["val"], target_size=TS,
                                 fragment_type="dialog", duration=None,
                                 audio_sample_rate=SR, data_dir=tree)
    clips = list(ds)
    assert clips  # episode 197 is val
    durations = {round(c.video_duration, 1) for c in clips}
    assert len(durations) >= 2  # subtitle lines of different lengths


def test_iterable_sharding(tree):
    ds = PeppaPigIterableDataset(split=["train"], target_size=TS,
                                 fragment_type="dialog", duration=2.0,
                                 audio_sample_rate=SR, data_dir=tree)
    full = [c.filename for c in ds]
    parts = []
    for i in range(2):
        shard = PeppaPigIterableDataset(
            split=["train"], target_size=TS, fragment_type="dialog",
            duration=2.0, audio_sample_rate=SR, data_dir=tree).shard(i, 2)
        parts.extend(c.filename for c in shard)
    assert sorted(parts) == sorted(full)


def test_cached_dataset_builds_from_iterable(tree):
    ds = PeppaPigDataset(split=["train"], target_size=TS,
                         fragment_type="dialog", duration=2.0,
                         audio_sample_rate=SR, data_dir=tree)
    assert len(ds) == 12
    item = ds[0]
    # cached items ship uint8 (the encoders fuse /255 on device)
    assert item.video.dtype == np.uint8
    # cache reload (no source kwargs needed)
    again = PeppaPigDataset.load(ds.cache_dir)
    assert len(again) == len(ds)
    np.testing.assert_allclose(again[3].audio, ds[3].audio)
    # scrambled-video control permutes frames only
    scrambled = PeppaPigDataset(cache_dir=ds.cache_dir, scrambled_video=True,
                                scramble_seed=0)
    np.testing.assert_allclose(np.sort(scrambled[0].video.ravel()),
                               np.sort(item.video.ravel()), atol=1e-6)


def test_stats_over_tree(tree):
    ds = PeppaPigIterableDataset(split=["train"], target_size=TS,
                                 fragment_type="dialog", duration=2.0,
                                 audio_sample_rate=SR, data_dir=tree)
    stats = compute_stats(ds)
    assert stats.video_mean.shape == (3,)
    assert (stats.video_std > 0).all()
    # uint8 uniform video -> mean ~0.5
    np.testing.assert_allclose(stats.video_mean, 0.5, atol=0.05)
    assert stats.audio_std == pytest.approx(0.1, abs=0.02)
