"""Human-check export utilities over a synthetic item cache."""

import json
import os

import numpy as np

from peppa_tpu.data.dataset import PeppaPigDataset
from peppa_tpu.data.types import Clip


def build_cache(tmp_path, rng, n=10, h=24, w=32, sr=800):
    cache_dir = str(tmp_path / "items-test")
    os.makedirs(cache_dir)
    ds = PeppaPigDataset.__new__(PeppaPigDataset)
    ds.cache_dir = cache_dir
    for i in range(n):
        t = 4 if i % 2 == 0 else 6  # two duration groups -> pairs exist
        s = t * sr // 10
        clip = Clip(video=rng.uniform(size=(t, h, w, 3)).astype(np.float32),
                    audio=rng.normal(size=(s,)).astype(np.float32),
                    video_duration=t / 10.0, audio_duration=t / 10.0,
                    filename=f"clip{i}")
        PeppaPigDataset._save_item(ds, i, clip)
    return cache_dir


def test_export_triplets(tmp_path, rng, monkeypatch):
    import peppa_tpu.evaluation.human_check as hc

    cache_dir = build_cache(tmp_path, rng)

    def fake_dataset(**kwargs):
        return PeppaPigDataset(cache_dir=cache_dir)

    monkeypatch.setattr("peppa_tpu.data.dataset.PeppaPigDataset",
                        lambda **kw: fake_dataset(**kw))
    out_dir = str(tmp_path / "check")
    key = hc.export_triplets(out_dir, n=3, audio_sample_rate=800)
    assert len(key) == 3
    with open(os.path.join(out_dir, "answer_key.json")) as f:
        saved = json.load(f)
    assert saved == key
    for entry in key:
        d = os.path.join(out_dir, str(entry["index"]))
        assert os.path.exists(os.path.join(d, "anchor.wav"))
        assert (os.path.exists(os.path.join(d, "left.mp4"))
                or os.path.exists(os.path.join(d, "left.png")))
        assert entry["target"] in ("l", "r")
        assert entry["target_file"] != entry["distractor_file"]


def test_run_terminal_check(tmp_path, rng, monkeypatch):
    import peppa_tpu.evaluation.human_check as hc

    key = [dict(index=0, target="l", target_file="a", distractor_file="b"),
           dict(index=1, target="r", target_file="c", distractor_file="d")]
    out_dir = tmp_path / "check"
    out_dir.mkdir()
    with open(out_dir / "answer_key.json", "w") as f:
        json.dump(key, f)
    answers = iter(["l", "l"])  # first right, second wrong
    monkeypatch.setattr("builtins.input", lambda *_: next(answers))
    acc = hc.run_terminal_check(str(out_dir))
    assert acc == 0.5
