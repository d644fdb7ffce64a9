"""Integration: PigData's native train path over a prebuilt item cache."""

import numpy as np
import pytest

from peppa_tpu.config import Config
from peppa_tpu.data.datamodule import PigData
from peppa_tpu.data.dataset import PeppaPigDataset
from peppa_tpu.data.types import Clip


def build_cache(tmp_path, rng, n=12, h=24, w=32, sr=800):
    cache_dir = str(tmp_path / "items-test")
    import os

    os.makedirs(cache_dir)
    ds = PeppaPigDataset.__new__(PeppaPigDataset)
    ds.cache_dir = cache_dir
    for i in range(n):
        t = int(rng.integers(3, 9))
        s = int(rng.integers(sr // 2, sr * 2))
        clip = Clip(video=rng.uniform(size=(t, h, w, 3)).astype(np.float32),
                    audio=rng.normal(size=(s,)).astype(np.float32),
                    video_duration=t / 10.0, audio_duration=s / sr,
                    filename=f"clip{i}")
        PeppaPigDataset._save_item(ds, i, clip)
    return cache_dir


def test_native_train_batches(tmp_path, rng):
    from peppa_tpu.native import native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")
    cache_dir = build_cache(tmp_path, rng)
    cfg = Config()
    cfg.data.target_size = (32, 24)
    cfg.data.audio_sample_rate = 800
    cfg.data.train.batch_size = 3
    cfg.tpu.bucket_durations = (1.0, 2.0)
    data = PigData(cfg)
    data.train = PeppaPigDataset(cache_dir=cache_dir)

    batches = list(data.train_batches(epoch=0))
    assert batches, "native path yielded no batches"
    total = 0
    for b in batches:
        assert b.video.dtype == np.uint8
        assert b.video.shape[0] == 3
        # static bucket shapes only
        assert b.video.shape[1] in (10, 20)
        assert b.audio.shape[1] in (800, 1600)
        total += b.video.shape[0]
    assert total <= 12
    # the fallback Python path yields the same item count per epoch
    cfg.tpu.native_loader = False
    py_batches = list(data.train_batches(epoch=0))
    assert sum(b.video.shape[0] for b in py_batches) == total
