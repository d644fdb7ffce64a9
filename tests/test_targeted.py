"""Targeted (minimal-pairs) triplet pipeline over synthetic episodes."""

import json
import os

import jax
import numpy as np
import pandas as pd
import pytest

from peppa_tpu.data import decode as D


SR = 800
TS = (32, 24)  # (W, H)


def make_episode(tmp_path, rng, duration=20.0, fps=10):
    path = str(tmp_path / "data" / "in" / "ep1.npz")
    D.save_clip_npz(path,
                    (rng.uniform(size=(int(duration * fps), TS[1], TS[0], 3))
                     * 255).astype(np.uint8),
                    rng.normal(size=(int(duration * SR),)).astype(np.float32),
                    fps=fps, sample_rate=SR)
    return path


def make_eval_csv(tmp_path, episode_path, n_pairs=3):
    rows = []
    for i in range(n_pairs):
        t0 = 1.0 + 2 * i
        rows.append(dict(id=2 * i, episode_filepath=episode_path,
                         clipStart=t0, clipEnd=t0 + 0.8,
                         transcript=f"phrase {i} a", target_word=f"w{i}a",
                         distractor_word=f"w{i}b",
                         id_counterexample=2 * i + 1))
        rows.append(dict(id=2 * i + 1, episode_filepath=episode_path,
                         clipStart=t0 + 1.0, clipEnd=t0 + 1.7,
                         transcript=f"phrase {i} b", target_word=f"w{i}b",
                         distractor_word=f"w{i}a",
                         id_counterexample=2 * i))
    eval_dir = tmp_path / "data" / "eval"
    eval_dir.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame.from_records(rows).set_index("id")
    df.to_csv(eval_dir / "eval_set_narration_NOUN.csv")
    return df


def test_targeted_triplet_pipeline(tmp_path, rng):
    from peppa_tpu.config import Config
    from peppa_tpu.evaluation.evaluation import make_predict
    from peppa_tpu.evaluation.targeted import (
        PeppaTargetedTripletCachedDataset,
        collate_triplets,
        targeted_triplet_score,
    )
    from peppa_tpu.models.dual_encoder import init_model

    episode = make_episode(tmp_path, rng)
    info = make_eval_csv(tmp_path, episode)
    data_dir = str(tmp_path / "data")

    ds = PeppaTargetedTripletCachedDataset(
        "narration", "NOUN", target_size=TS, audio_sample_rate=SR,
        data_dir=data_dir)
    assert len(ds) == len(info)
    item = ds[0]
    assert item.positive.ndim == 4 and item.anchor.ndim == 1
    batch = collate_triplets([ds[0], ds[1]])
    assert batch.positive.shape[0] == 2
    assert batch.positive.shape == batch.negative.shape

    # scrambled control permutes frames but keeps content
    ds_s = PeppaTargetedTripletCachedDataset(
        "narration", "NOUN", target_size=TS, audio_sample_rate=SR,
        data_dir=data_dir, scrambled_video=True, scramble_seed=0)
    item_s = ds_s[0]
    np.testing.assert_allclose(np.sort(item_s.positive.ravel()),
                               np.sort(item.positive.ravel()), atol=1e-6)

    cfg = Config()
    cfg.data.target_size = TS
    cfg.data.audio_sample_rate = SR
    cfg.training.precision = "fp32"
    cfg.audio.full = False
    cfg.video.version = "r3d_18"
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    scores = targeted_triplet_score(
        "narration", "NOUN", make_predict(model, variables), batch_size=2,
        target_size=TS, audio_sample_rate=SR, data_dir=data_dir)
    assert len(scores) == len(info)
    assert ((scores >= 0) & (scores <= 1)).all()


def test_targeted_plot_helpers(tmp_path, rng, monkeypatch):
    """Bootstrap/boxplot/correlation helpers over a synthetic scores CSV."""
    import importlib
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    ett = importlib.import_module("evaluation_targeted_triplets")
    monkeypatch.setattr(ett, "RESULTS_DIR", str(tmp_path / "rt"))

    words = ["big", "little", "muddy", "new"]
    rows = []
    for i in range(80):
        t0 = float(rng.uniform(0, 10))
        w = words[i % 4]
        d = words[(i + 1) % 4]
        rows.append(dict(id=i, pos="ADJ" if i % 2 else "NOUN",
                         target_word=w, distractor_word=d,
                         clipStart=t0, clipEnd=t0 + float(rng.uniform(0.3, 2)),
                         scrambled_video=False,
                         result=float(rng.integers(0, 2))))
    d = tmp_path / "rt" / "version_0"
    d.mkdir(parents=True)
    pd.DataFrame.from_records(rows).to_csv(d / "minimal_pairs_scores.csv",
                                           index=False)

    df = ett.get_all_results_df(0, ["ADJ", "NOUN"], per_word_results=True)
    assert "word" in df.columns and "duration" in df.columns
    boot = ett.bootstrap_scores_for_column(df, "word")
    assert set(boot.columns) == {"score", "word"}
    assert ((boot.score >= 0) & (boot.score <= 1)).all()

    ett.create_per_word_result_plots("base", [0], min_samples=2)
    assert os.path.exists(tmp_path / "rt" / "condition_base" /
                          "acc_per_word_NOUN.pdf")
    ett.create_duration_results_plots("base", [0])
    assert os.path.exists(tmp_path / "rt" / "condition_base" /
                          "acc_per_duration.pdf")
