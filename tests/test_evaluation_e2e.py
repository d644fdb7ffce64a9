"""End-to-end evaluation battery over synthetic item caches (no media).

Exercises full_score (triplet + fixed/jitter bootstrap retrieval, intact and
scrambled), score_means aggregation, and the eval-set-driven targeted scorer,
with a tiny random-init model on CPU.
"""

import os

import jax
import numpy as np
import pytest

from peppa_tpu.config import Config
from peppa_tpu.data.dataset import PeppaPigDataset, PeppaPigIterableDataset
from peppa_tpu.data.types import Clip

SR = 800
TS = (32, 32)


def tiny_config(tmp_path):
    cfg = Config()
    cfg.data.target_size = TS
    cfg.data.audio_sample_rate = SR
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.training.precision = "fp32"
    cfg.audio.full = False
    cfg.video.version = "r3d_18"
    return cfg


def fill_cache(data_dir, rng, split, fragment, duration, jitter=False,
               jitter_sd=None, n=12):
    ds = PeppaPigIterableDataset(
        split=[split], target_size=TS, fragment_type=fragment,
        duration=duration, audio_sample_rate=SR, jitter=jitter,
        jitter_sd=jitter_sd, data_dir=data_dir)
    cache_dir = os.path.join(data_dir, "out", f"items-{ds.config_id()}")
    os.makedirs(cache_dir, exist_ok=True)
    writer = PeppaPigDataset.__new__(PeppaPigDataset)
    writer.cache_dir = cache_dir
    for i in range(n):
        # two distinct durations only: keeps the set of XLA batch shapes
        # (and thus CPU test compiles) small
        t = 4 if duration else (4 if i % 2 == 0 else 6)
        s = int(t * SR / 10)
        clip = Clip(video=rng.uniform(size=(t, TS[1], TS[0], 3))
                    .astype(np.float32),
                    audio=rng.normal(size=(s,)).astype(np.float32),
                    video_duration=t / 10.0, audio_duration=t / 10.0,
                    filename=f"{fragment}/{i}")
        PeppaPigDataset._save_item(writer, i, clip)
    return cache_dir


@pytest.mark.slow
def test_full_score_and_means(tmp_path, rng):
    from peppa_tpu.evaluation.evaluation import full_score, score_means
    from peppa_tpu.models.dual_encoder import init_model

    cfg = tiny_config(tmp_path)
    data_dir = cfg.data.data_dir
    for fragment in ("dialog", "narration"):
        fill_cache(data_dir, rng, "val", fragment, None)       # triplet sets
        fill_cache(data_dir, rng, "val", fragment, 2.3)        # fixed
        fill_cache(data_dir, rng, "val", fragment, 2.3, True, 0.5)  # jitter
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    rows = full_score(model, variables, cfg, split=["val"],
                      data_dir=data_dir, n_samples=8)
    assert len(rows) == 4  # 2 fragments x scrambled {False, True}
    for row in rows:
        acc = np.asarray(row["triplet_acc"])
        assert acc.shape == (8,)
        assert ((acc >= 0) & (acc <= 1)).all()
        rec = np.asarray(row["recall_fixed"])
        assert rec.shape[0] == 8 and rec.shape[1] == 11  # recall@0..10
        assert ((rec >= 0) & (rec <= 1)).all()
        # random embeddings on 12 items: recall@10 should be high, recall@1 low
        assert rec[:, 10, :].mean() > rec[:, 1, :].mean()

    for row in rows:  # score_means needs the condition fields
        row["hparams_path"] = None
    table = score_means(rows)
    assert {"triplet_acc", "triplet_acc_std", "recall_at_10_fixed",
            "recall_at_10_jitter"} <= set(table.columns)


@pytest.mark.slow
def test_validation_protocol_metrics(tmp_path, rng):
    """The 4-loader validation yields the reference's monitor keys."""
    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.evaluation.validation import run_validation
    from peppa_tpu.models.dual_encoder import init_model
    from peppa_tpu.training.step import make_eval_step

    cfg = tiny_config(tmp_path)
    cfg.data.train.duration = 0.8
    cfg.data.val.duration = 0.8
    data = SyntheticPigData(cfg, n_train=8, n_val=8)
    data.setup()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    eval_step = make_eval_step(model)
    metrics = run_validation(eval_step, variables, data.val_loaders(),
                             n_samples=5, limit_batches=2, seed=0)
    assert {"val_loss", "valnarr_loss", "val_rec_fixed", "valnarr_rec_fixed",
            "val_triplet", "valnarr_triplet"} <= set(metrics)
    for v in metrics.values():
        assert np.isfinite(v)


def test_data_statistics(tmp_path, rng):
    from peppa_tpu.evaluation.evaluation import data_statistics

    data_dir = str(tmp_path / "data")
    fps = 10
    for fragment, split_eps in (("dialog", [1, 197]), ("narration", [1, 105])):
        for ep in split_eps:
            d = os.path.join(data_dir, "out", "32x32", fragment, str(ep))
            os.makedirs(d, exist_ok=True)
            from peppa_tpu.data import decode as D

            D.save_clip_npz(os.path.join(d, "0.npz"),
                            (rng.uniform(size=(50, 32, 32, 3)) * 255)
                            .astype(np.uint8),
                            rng.normal(size=(800,)).astype(np.float32),
                            fps=fps, sample_rate=160)
    results_dir = str(tmp_path / "results")
    data_statistics(results_dir=results_dir, data_dir=data_dir,
                    target_size=(32, 32))
    import pandas as pd

    df = pd.read_csv(os.path.join(results_dir, "data_statistics.csv"))
    assert {"Split", "Type", "Size (h)", "# Clips"} <= set(df.columns)
    assert len(df) == 4  # train/val dialog + val/test narration rows
    assert os.path.exists(os.path.join(results_dir, "data_statistics.tex"))
