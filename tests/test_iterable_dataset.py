"""Iterable-dataset path over a synthetic episode tree: glob -> segment ->
decode -> cache -> stats."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

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


def test_failed_cache_build_leaves_nothing(tree):
    """A build that raises partway must not leave a trusted half-built cache.

    Regression: one failed evaluate.py run (missing media) left an empty
    items-* dir; every later run then served a 0-item dataset silently.
    """
    import glob

    class Boom(Exception):
        pass

    kwargs = dict(split=["train"], target_size=TS, fragment_type="dialog",
                  duration=2.0, audio_sample_rate=SR, data_dir=tree)
    src = PeppaPigIterableDataset(**kwargs)

    real_iter = PeppaPigIterableDataset.__iter__

    def exploding_iter(self):
        it = real_iter(self)
        yield next(it)  # one item lands in the temp dir, then the build dies
        raise Boom()

    import peppa_tpu.data.dataset as dsmod
    orig = dsmod.PeppaPigIterableDataset.__iter__
    dsmod.PeppaPigIterableDataset.__iter__ = exploding_iter
    try:
        with pytest.raises(Boom):
            PeppaPigDataset(**kwargs)
    finally:
        dsmod.PeppaPigIterableDataset.__iter__ = orig
    # neither the published cache dir nor any temp build dir survives
    assert not os.path.isdir(
        os.path.join(tree, "out", f"items-{src.config_id()}"))
    assert glob.glob(os.path.join(tree, "out", "items-*.building-*")) == []
    # a retry builds the full cache
    ds = PeppaPigDataset(**kwargs)
    assert len(ds) > 0


def test_empty_source_raises_not_silent(tree):
    """A source that yields zero items (without raising itself) must fail the
    build with a clear error AND leave no published cache dir behind."""
    import glob

    kwargs = dict(split=["train"], target_size=TS, fragment_type="dialog",
                  duration=2.0, audio_sample_rate=SR, data_dir=tree)
    src = PeppaPigIterableDataset(**kwargs)

    import peppa_tpu.data.dataset as dsmod
    orig = dsmod.PeppaPigIterableDataset.__iter__
    dsmod.PeppaPigIterableDataset.__iter__ = lambda self: iter(())
    try:
        with pytest.raises(RuntimeError, match="produced no items"):
            PeppaPigDataset(**kwargs)
    finally:
        dsmod.PeppaPigIterableDataset.__iter__ = orig
    assert not os.path.isdir(
        os.path.join(tree, "out", f"items-{src.config_id()}"))
    assert glob.glob(os.path.join(tree, "out", "items-*.building-*")) == []
    # ...and a later run with working media rebuilds cleanly
    assert len(PeppaPigDataset(**kwargs)) > 0


def test_empty_leftover_cache_dir_is_rebuilt(tree):
    """An items-* dir with no items (pre-fix poisoned leftover) triggers a
    rebuild instead of being trusted or raising forever."""
    kwargs = dict(split=["train"], target_size=TS, fragment_type="dialog",
                  duration=2.0, audio_sample_rate=SR, data_dir=tree)
    src = PeppaPigIterableDataset(**kwargs)
    leftover = os.path.join(tree, "out", f"items-{src.config_id()}")
    os.makedirs(leftover)
    with open(os.path.join(leftover, "settings.pkl"), "wb") as f:
        f.write(b"stale")
    ds = PeppaPigDataset(**kwargs)
    assert len(ds) > 0


def test_import_reference_cache_roundtrip(tree, tmp_path):
    """Reference items-*/{i}.pt caches convert to our npz cache faithfully."""
    torch = pytest.importorskip("torch")

    from types import SimpleNamespace

    def RefClip(video, audio, vd, ad):  # shape of the reference's pickled Clip
        return SimpleNamespace(video=video, audio=audio, video_duration=vd,
                               audio_duration=ad, filename="ep_1/0.avi")

    ref_dir = tmp_path / "ref_items"
    ref_dir.mkdir()
    rng = np.random.default_rng(0)
    vids = []
    for i in range(3):
        v = torch.tensor(rng.uniform(size=(3, 4, 8, 6)).astype(np.float32))
        a = torch.tensor(rng.normal(size=(1, 160)).astype(np.float32))
        vids.append(v)
        torch.save(RefClip(v, a, 0.4, 0.4), str(ref_dir / f"{i}.pt"))

    out_dir = str(tmp_path / "items-imported")
    ds = PeppaPigDataset.import_reference_cache(str(ref_dir), out_dir)
    assert len(ds) == 3
    item = ds[1]
    # (C,T,H,W) float -> (T,H,W,C) uint8
    assert item.video.shape == (4, 8, 6, 3)
    assert item.video.dtype == np.uint8
    want = np.transpose(np.asarray(vids[1]), (1, 2, 3, 0))
    np.testing.assert_allclose(item.video.astype(np.float32) / 255.0,
                               want, atol=1 / 255.0)
    assert item.audio.shape == (160,)
    assert item.audio_duration == pytest.approx(0.4)


def test_concurrent_cache_builders_race_benignly(tmp_path):
    """The losing builder's os.replace onto a published non-empty cache must
    fall back to the winner's cache, not crash with ENOTEMPTY."""
    from peppa_tpu.data.dataset import atomic_cache_build

    cache = str(tmp_path / "items-race")

    def build(tmp):
        np.savez(os.path.join(tmp, "0.npz"), x=np.zeros(1))
        # simulate the other process publishing first
        os.makedirs(cache, exist_ok=True)
        np.savez(os.path.join(cache, "0.npz"), x=np.ones(1))
        np.savez(os.path.join(cache, "1.npz"), x=np.ones(1))

    atomic_cache_build(cache, build)  # must not raise
    # the winner's cache is the one in place
    assert sorted(os.listdir(cache)) == ["0.npz", "1.npz"]
    import glob as g
    assert g.glob(cache + ".building-*") == []
