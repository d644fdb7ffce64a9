"""Full evaluation battery: retrieval + triplet scores, tables, stats.

Capability parity: reference pig/evaluation.py —
- `full_score` (evaluation.py:68-110): per fragment_type x scrambled_video,
  triplet accuracy + bootstrap recall curves for fixed and jittered
  segmentation;
- `resampled_retrieval_score` (evaluation.py:131-163): encode a
  duration-grouped loader, bootstrap recall@1..10 over 500 subsets of 100;
- `full_run` / `test_run` / `test_table` / `format` (evaluation.py:247-291,
  202-226): batch-evaluate versions from conditions.yaml into
  results/full_scores_v{N}.pt and LaTeX tables;
- `data_statistics` (evaluation.py:23-39).

Result files are torch-saved dicts of numpy arrays — byte-compatible with the
reference's analysis layer (torch is an IO library here, never compute).
Fixed seeds mirror evaluation.py:18-19.
"""

from __future__ import annotations

import logging
import os
from copy import deepcopy
from typing import Callable, Dict, List, Optional, Sequence

import jax
import numpy as np
import yaml

import peppa_tpu.data.dataset as data
from peppa_tpu.evaluation.triplet import TripletScorer, comparative_score_triplets
from peppa_tpu.ops.metrics import resampled_recall_at_1_to_n

BATCH_SIZE = 8  # reference evaluation.py:21
EVAL_SEED = 666  # reference evaluation.py:18-19


def make_predict(model, variables) -> Callable:
    """jit'd ClipBatch -> embeddings ClipBatch closure."""
    import jax.numpy as jnp

    @jax.jit
    def fwd(vs, batch):
        return model.apply(vs, batch, train=False)

    def run(batch):
        b = jax.tree.map(
            lambda x: jnp.asarray(x) if x is not None else None, batch)
        return fwd(variables, b)

    return run


def resampled_retrieval_score(fragment_type: str, predict_fn: Callable,
                              target_size=(180, 100), duration: float = 2.3,
                              jitter: bool = False,
                              jitter_sd: Optional[float] = None,
                              batch_size: int = BATCH_SIZE,
                              audio_sample_rate: int = 44100,
                              scrambled_video: bool = False,
                              split: Sequence[str] = ("val",),
                              one_to_n: bool = False,
                              data_dir: str = "data",
                              n_samples: int = 500) -> np.ndarray:
    ds = data.PeppaPigDataset(
        target_size=target_size, split=list(split), fragment_type=fragment_type,
        duration=duration, audio_sample_rate=audio_sample_rate,
        jitter=jitter, jitter_sd=jitter_sd, scrambled_video=scrambled_video,
        data_dir=data_dir)
    key = lambda x: x.audio_duration
    vs, as_ = [], []
    for batch in data.grouped_batches(ds, key, batch_size=batch_size):
        out = predict_fn(batch)
        vs.append(np.asarray(out.video))
        as_.append(np.asarray(out.audio))
    V = np.concatenate(vs)
    A = np.concatenate(as_)
    size = min(100, len(V))
    rec = resampled_recall_at_1_to_n(V, A, jax.random.PRNGKey(EVAL_SEED),
                                     size=size, n_samples=n_samples, N=10)
    rec = np.asarray(rec).transpose(0, 1, 2)  # (n_samples, 11, size)
    if one_to_n:
        return rec
    return rec[:, 10, :]


def triplet_score(fragment_type: str, predict_fn: Callable,
                  target_size=(180, 100), batch_size: int = BATCH_SIZE,
                  audio_sample_rate: int = 44100, scrambled_video: bool = False,
                  split: Sequence[str] = ("val",), data_dir: str = "data",
                  n_samples: int = 500):
    scorer = TripletScorer(fragment_type=fragment_type, split=split,
                           target_size=target_size,
                           audio_sample_rate=audio_sample_rate,
                           scrambled_video=scrambled_video, data_dir=data_dir)
    return scorer.evaluate(predict_fn, batch_size=batch_size,
                           n_samples=n_samples, seed=EVAL_SEED)


def full_score(model, variables, config, split: Sequence[str] = ("val",),
               data_dir: Optional[str] = None,
               n_samples: int = 500) -> List[Dict]:
    """All standard scores for a model (reference pig/evaluation.py:68-110)."""
    predict_fn = make_predict(model, variables)
    data_dir = data_dir or config.data.data_dir
    target_size = config.data.target_size
    sr = config.data.audio_sample_rate
    if list(split) == ["test"]:
        types = ["narration"]
    elif list(split) == ["val"]:
        types = ["dialog", "narration"]
    else:
        raise NotImplementedError
    rows = []
    for fragment_type in types:
        for scrambled_video in (False, True):
            logging.info("Evaluating: %s, scramble=%s triplet",
                         fragment_type, scrambled_video)
            acc = triplet_score(fragment_type, predict_fn, target_size,
                                audio_sample_rate=sr,
                                scrambled_video=scrambled_video, split=split,
                                data_dir=data_dir, n_samples=n_samples)
            logging.info("Evaluating: %s, scramble=%s recall_fixed",
                         fragment_type, scrambled_video)
            rec_fixed = resampled_retrieval_score(
                fragment_type, predict_fn, target_size, duration=2.3,
                jitter=False, jitter_sd=None, audio_sample_rate=sr,
                scrambled_video=scrambled_video, split=split, one_to_n=True,
                data_dir=data_dir, n_samples=n_samples)
            logging.info("Evaluating: %s, scramble=%s recall_jitter",
                         fragment_type, scrambled_video)
            rec_jitter = resampled_retrieval_score(
                fragment_type, predict_fn, target_size, duration=2.3,
                jitter=True, jitter_sd=0.5, audio_sample_rate=sr,
                scrambled_video=scrambled_video, split=split, one_to_n=True,
                data_dir=data_dir, n_samples=n_samples)
            rows.append(dict(fragment_type=fragment_type,
                             scrambled_video=scrambled_video,
                             triplet_acc=acc["accuracy"],
                             recall_fixed=rec_fixed,
                             recall_jitter=rec_jitter,
                             recall_at_10_fixed=rec_fixed[:, 10, :],
                             recall_at_10_jitter=rec_jitter[:, 10, :]))
    return rows


# --------------------------------------------------------------- run drivers

def add_condition(rows: List[Dict]) -> List[Dict]:
    """Annotate result rows with their config-derived condition columns.

    Parity: reference pig/evaluation.py:229-244.
    """
    out = []
    for row in rows:
        record = dict(row)
        with open(row["hparams_path"]) as f:
            config = yaml.safe_load(f)
        record["jitter"] = config["data"]["train"]["jitter"]
        record["static"] = config["video"].get("static", False)
        record["audio_pretrained"] = config["audio"]["pretrained"]
        record["video_pretrained"] = config["video"]["pretrained"]
        record["resolution"] = "x".join(map(str, config["data"]["target_size"]))
        record["freeze_wav2vec"] = (config["audio"]["freeze_feature_extractor"]
                                    and config["audio"].get("freeze_encoder_layers") == 12)
        record["sample_rate"] = str(config["data"].get("audio_sample_rate", 44100))
        out.append(record)
    return out


def _torch_save(obj, path: str) -> None:
    import torch

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(obj, path)


def full_run(versions: Optional[Sequence] = None,
             log_dir: str = "lightning_logs",
             results_dir: str = "results",
             n_samples: int = 500) -> None:
    """Evaluate checkpointed runs on val (reference pig/evaluation.py:247-261)."""
    from peppa_tpu.training.checkpoint import load_best_model

    if versions is None:
        with open("conditions.yaml") as f:
            conditions = yaml.safe_load(f)
        versions = [v for vals in conditions.values() for v in vals]
    logging.getLogger().setLevel(logging.INFO)
    for version in versions:
        rows = []
        logging.info("Evaluating version %s", version)
        dirname = os.path.join(log_dir, f"version_{version}")
        model, variables, config, path = load_best_model(dirname)
        for row in full_score(model, variables, config, split=["val"],
                              n_samples=n_samples):
            row["version"] = version
            row["checkpoint_path"] = path
            row["hparams_path"] = os.path.join(dirname, "hparams.yaml")
            rows.append(row)
        _torch_save(add_condition(rows),
                    os.path.join(results_dir, f"full_scores_v{version}.pt"))


def test_run(log_dir: str = "lightning_logs", results_dir: str = "results",
             n_samples: int = 500) -> None:
    """Evaluate the base condition on the test split (reference evaluation.py:265-276)."""
    from peppa_tpu.training.checkpoint import load_best_model

    with open("conditions.yaml") as f:
        conditions = yaml.safe_load(f)
    rows = []
    for version in conditions["base"]:
        logging.info("Evaluating version %s", version)
        dirname = os.path.join(log_dir, f"version_{version}")
        model, variables, config, path = load_best_model(dirname)
        for row in full_score(model, variables, config, split=["test"],
                              n_samples=n_samples):
            row["version"] = version
            row["checkpoint_path"] = path
            row["hparams_path"] = os.path.join(dirname, "hparams.yaml")
            rows.append(row)
    _torch_save(add_condition(rows),
                os.path.join(results_dir, "full_test_scores.pt"))


def score_means(rows: List[Dict]):
    """Aggregate bootstrap tensors to means/stds (reference evaluation.py:55-66)."""
    import pandas as pd

    out = []
    for item in rows:
        row = deepcopy(item)
        acc = np.asarray(row["triplet_acc"])
        row["triplet_acc_std"] = float(acc.std())
        row["triplet_acc"] = float(acc.mean())
        for k in ("recall_at_10_fixed", "recall_at_10_jitter"):
            r = np.asarray(row[k])
            row[k + "_std"] = float(r.mean(axis=1).std())
            row[k] = float(r.mean(axis=1).mean())
        out.append(row)
    return pd.DataFrame.from_records(out)


def pretraining(row) -> str:
    return {(True, True): "AV", (True, False): "A",
            (False, True): "V", (False, False): "None"}[
                row["audio_pretrained"], row["video_pretrained"]]


def merge_scores(versions: Optional[Sequence] = None,
                 results_dir: str = "results") -> None:
    """Concatenate full_scores_v{N}.pt into full_scores.pt for format_tables."""
    import glob as _glob

    import torch

    if versions is not None:
        paths = [os.path.join(results_dir, f"full_scores_v{v}.pt")
                 for v in versions]
    else:
        paths = sorted(_glob.glob(os.path.join(results_dir,
                                               "full_scores_v*.pt")))
    rows = []
    for p in paths:
        rows.extend(torch.load(p, weights_only=False))
    _torch_save(rows, os.path.join(results_dir, "full_scores.pt"))


def format_tables(results_dir: str = "results") -> None:
    """results/full_scores.pt -> scores.csv + scores_{dialog,narration}.tex
    (reference pig/evaluation.py:202-226; the shipped results/scores.csv is
    the same score_means frame dumped raw — its 'vidoe_pretrained' column is
    the reference's typo, kept correct here as 'video_pretrained')."""
    import pandas as pd
    import torch

    rows = torch.load(os.path.join(results_dir, "full_scores.pt"),
                      weights_only=False)
    rows = add_condition(rows)
    table_all = score_means(rows)
    csv_cols = ["fragment_type", "triplet_acc", "triplet_acc_std",
                "recall_at_10_fixed", "recall_at_10_fixed_std",
                "recall_at_10_jitter", "recall_at_10_jitter_std", "version",
                "checkpoint_path", "hparams_path", "jitter", "static",
                "audio_pretrained", "video_pretrained", "resolution"]
    (table_all[[c for c in csv_cols if c in table_all.columns]]
     .to_csv(os.path.join(results_dir, "scores.csv"), index=False))
    for fragment_type in ("dialog", "narration"):
        table = table_all.query(f"fragment_type=='{fragment_type}'").copy()
        table["pretraining"] = pd.Categorical(
            table.apply(pretraining, axis=1),
            categories=["AV", "A", "V", "None"])
        formatted = (table[["version", "static", "jitter", "pretraining",
                            "resolution", "recall_at_10_fixed",
                            "recall_at_10_jitter", "triplet_acc"]]
                     .sort_values(by=["static", "jitter", "pretraining",
                                      "resolution"])
                     .replace(True, "Yes").replace(False, "")
                     .rename(columns=dict(
                         version="ID", static="Static", jitter="Jitter",
                         pretraining="Pretraining", resolution="Resolution",
                         recall_at_10_fixed="R@10 (fixed)",
                         recall_at_10_jitter="R@10 (jitter)",
                         triplet_acc="Triplet Acc")))
        path = os.path.join(results_dir, f"scores_{fragment_type}.tex")
        formatted.to_latex(buf=path, index=False, float_format="%.3f")


def test_table(results_dir: str = "results") -> None:
    """full_test_scores.pt -> scores_test.tex (reference evaluation.py:278-291)."""
    import pandas as pd
    import torch

    rows = torch.load(os.path.join(results_dir, "full_test_scores.pt"),
                      weights_only=False)
    rows = [r for r in rows if not r["scrambled_video"]]
    rf = np.concatenate([np.asarray(r["recall_at_10_fixed"]).mean(axis=1)
                         for r in rows])
    rj = np.concatenate([np.asarray(r["recall_at_10_jitter"]).mean(axis=1)
                         for r in rows])
    acc = np.concatenate([np.asarray(r["triplet_acc"]) for r in rows])
    pd.DataFrame.from_records([{
        "R@10 (fixed)": f"{rf.mean():0.2f} ± {rf.std():0.2f}",
        "R@10 (jitter)": f"{rj.mean():0.2f} ± {rj.std():0.2f}",
        "Triplet Acc": f"{acc.mean():0.2f} ± {acc.std():0.2f}",
    }]).to_latex(buf=os.path.join(results_dir, "scores_test.tex"), index=False)


def data_statistics(results_dir: str = "results", data_dir: str = "data",
                    target_size=(180, 100), durations_fn=None) -> None:
    """Clip counts/hours per split (reference pig/evaluation.py:23-39).

    `durations_fn(split, fragment_type) -> array of segment durations`
    overrides the dataset scan — the artifact validator uses it to check the
    writer's structure without episode media on disk.
    """
    import pandas as pd

    if durations_fn is None:
        def durations_fn(split, fragment_type):
            ds = data.PeppaPigIterableDataset(
                target_size=target_size, split=[split],
                fragment_type=fragment_type, duration=2.3, data_dir=data_dir)
            return np.array([s.duration for s in ds._raw_segments()])

    rows = []
    for split in ("train", "val", "test"):
        for fragment_type in ("dialog", "narration"):
            if data.SPLIT_SPEC[fragment_type][split] is None:
                continue
            durations = np.asarray(durations_fn(split, fragment_type))
            rows.append({"Split": split, "Type": fragment_type,
                         "Size (h)": durations.sum() / 3600,
                         "# Clips": len(durations)})
    df = pd.DataFrame.from_records(rows)
    os.makedirs(results_dir, exist_ok=True)
    df.to_csv(os.path.join(results_dir, "data_statistics.csv"),
              index=False, header=True)
    df.to_latex(os.path.join(results_dir, "data_statistics.tex"),
                index=False, header=True, float_format="%.2f")


def duration_effect(log_dir: str = "lightning_logs",
                    results_dir: str = "results") -> None:
    """Comparative triplet scoring across conditions (evaluation.py:293-314)."""
    from peppa_tpu.training.checkpoint import load_best_model

    with open("conditions.yaml") as f:
        conditions = yaml.safe_load(f)
    model_ids = conditions["pretraining_a"] + conditions["static"]
    encoded = []
    for model_id in model_ids:
        logging.info("Loading version %s", model_id)
        model, variables, config, _ = load_best_model(
            os.path.join(log_dir, f"version_{model_id}"))
        encoded.append((model, variables, config))
    out = []
    for fragment_type in ("dialog", "narration"):
        videos, audios, durs = [], [], None
        for model, variables, config in encoded:
            scorer = TripletScorer(fragment_type=fragment_type, split=["val"],
                                   target_size=config.data.target_size,
                                   audio_sample_rate=config.data.audio_sample_rate,
                                   data_dir=config.data.data_dir)
            scorer._encode(make_predict(model, variables), BATCH_SIZE)
            videos.append(scorer._video)
            audios.append(scorer._audio)
            durs = scorer._duration
        result = comparative_score_triplets(videos, audios, durs,
                                            n_samples=500, seed=EVAL_SEED)
        result["fragment_type"] = fragment_type
        result["model_ids"] = model_ids
        out.append(result)
    _torch_save(out, os.path.join(results_dir, "duration_effect.pt"))


def duration_effect_scramble(log_dir: str = "lightning_logs",
                             results_dir: str = "results") -> None:
    """Scrambled-vs-intact paired triplet comparison on the base runs.

    Parity: reference pig/evaluation.py:317-337 — each base model is scored
    on the same triplet samples with intact and frame-scrambled video.
    """
    from peppa_tpu.training.checkpoint import load_best_model

    with open("conditions.yaml") as f:
        conditions = yaml.safe_load(f)
    model_ids = conditions["base"]
    encoded = []
    for model_id in model_ids:
        logging.info("Loading version %s", model_id)
        model, variables, config, _ = load_best_model(
            os.path.join(log_dir, f"version_{model_id}"))
        encoded.append((model, variables, config))
    scrambled_flags = [False] * len(encoded) + [True] * len(encoded)
    out = []
    for fragment_type in ("dialog", "narration"):
        videos, audios, durs = [], [], None
        for scrambled in (False, True):
            for model, variables, config in encoded:
                scorer = TripletScorer(
                    fragment_type=fragment_type, split=["val"],
                    target_size=config.data.target_size,
                    audio_sample_rate=config.data.audio_sample_rate,
                    scrambled_video=scrambled,
                    data_dir=config.data.data_dir)
                scorer._encode(make_predict(model, variables), BATCH_SIZE)
                videos.append(scorer._video)
                audios.append(scorer._audio)
                durs = scorer._duration
        result = comparative_score_triplets(videos, audios, durs,
                                            n_samples=500, seed=EVAL_SEED)
        result["fragment_type"] = fragment_type
        result["model_ids"] = model_ids + model_ids
        result["scrambled_video"] = scrambled_flags
        out.append(result)
    _torch_save(out, os.path.join(results_dir, "duration_effect_scramble.pt"))
