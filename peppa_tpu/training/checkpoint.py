"""Checkpointing: monitor-best + last policy, version dirs, best-model loading.

Capability parity:
- two ModelCheckpoint callbacks monitoring `valnarr_rec_fixed` and
  `valnarr_triplet`, mode=max, save_top_k=1, save_last=True, filenames
  templated with epoch+metric (reference run.py:32-55);
- checkpoints embed the callback state (monitor, best score/path) used later
  for best-model selection (reference pig/evaluation.py:42-53);
- run dirs `lightning_logs/version_N/{hparams.yaml, checkpoints/*.ckpt}`
  (Lightning layout) so downstream tooling keeps working.

Format: a single `.ckpt` file = flax msgpack of
{state: {step, params, batch_stats, opt_state}, meta: {...}} — a pure pytree
snapshot, restored by structure-matching against a freshly built TrainState.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
import yaml
from flax import serialization


def _to_pure(tree):
    # jax.device_get issues copy_to_host_async for EVERY leaf before gathering
    # any of them, so the ~700 state-leaf transfers overlap; a per-leaf
    # np.asarray would serialize one device->host round trip per leaf, which
    # on a remote/tunneled PJRT link turns a 2 GB state fetch into minutes.
    import jax

    fetched = jax.device_get(tree)
    return jax.tree.map(np.asarray, fetched)


def save_checkpoint(path: str, state, meta: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "step": np.asarray(state.step),
        "params": _to_pure(state.params),
        "batch_stats": _to_pure(state.batch_stats),
        "opt_state": _to_pure(serialization.to_state_dict(state.opt_state)),
    }
    blob = serialization.msgpack_serialize(payload)
    with open(path, "wb") as f:
        f.write(blob)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def load_checkpoint(path: str, state=None) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (payload, meta). With `state` given, restores into its structure."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    if state is not None:
        restored = state.replace(
            step=payload["step"],
            params=serialization.from_state_dict(state.params, payload["params"]),
            batch_stats=serialization.from_state_dict(state.batch_stats,
                                                      payload["batch_stats"]),
            opt_state=serialization.from_state_dict(state.opt_state,
                                                    payload["opt_state"]),
        )
        return restored, meta
    return payload, meta


def load_params(path: str) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """Load just (params, batch_stats, meta) without an optimizer structure."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return payload["params"], payload.get("batch_stats", {}), meta


class CheckpointMonitor:
    """One monitor: keeps the best checkpoint for a metric (mode=max)."""

    def __init__(self, dirpath: str, monitor: str, mode: str = "max"):
        self.dirpath = dirpath
        self.monitor = monitor
        self.mode = mode
        self.best_score: Optional[float] = None
        self.best_path: Optional[str] = None

    def improved(self, score: float) -> bool:
        if self.best_score is None:
            return True
        return score > self.best_score if self.mode == "max" else score < self.best_score

    def update(self, state, metrics: Dict[str, float], epoch: int) -> Optional[str]:
        if self.monitor not in metrics:
            return None
        score = float(metrics[self.monitor])
        if not self.improved(score):
            return None
        # remove previous best (save_top_k=1)
        if self.best_path and os.path.exists(self.best_path):
            os.remove(self.best_path)
            if os.path.exists(self.best_path + ".json"):
                os.remove(self.best_path + ".json")
        fname = f"epoch={epoch}-{self.monitor}={score:.2f}.ckpt"
        path = os.path.join(self.dirpath, fname)
        self.best_score = score
        self.best_path = path
        save_checkpoint(path, state, self.meta_dict(epoch, metrics))
        logging.info("Saved best %s=%.4f to %s", self.monitor, score, path)
        return path

    def meta_dict(self, epoch: int, metrics: Dict[str, float]) -> Dict[str, Any]:
        return {
            "monitor": self.monitor,
            "mode": self.mode,
            "best_model_score": self.best_score,
            "best_model_path": self.best_path,
            "epoch": epoch,
            "metrics": {k: float(v) for k, v in metrics.items()},
        }


class CheckpointManager:
    """The reference's dual-monitor + last policy (run.py:32-55)."""

    def __init__(self, version_dir: str,
                 monitors: Tuple[str, ...] = ("valnarr_rec_fixed", "valnarr_triplet")):
        self.ckpt_dir = os.path.join(version_dir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.monitors = [CheckpointMonitor(self.ckpt_dir, m) for m in monitors]

    def on_validation_end(self, state, metrics: Dict[str, float], epoch: int) -> None:
        for m in self.monitors:
            m.update(state, metrics, epoch)
        # save_last=True
        last = os.path.join(self.ckpt_dir, "last.ckpt")
        save_checkpoint(last, state, {
            "monitor": None,
            "best_model_score": None,
            "epoch": epoch,
            "metrics": {k: float(v) for k, v in metrics.items()},
            "monitors": [m.meta_dict(epoch, metrics) for m in self.monitors],
        })


def next_version(log_dir: str = "lightning_logs") -> str:
    """Allocate the next `version_N` run directory (Lightning layout parity)."""
    os.makedirs(log_dir, exist_ok=True)
    existing = []
    for p in glob.glob(os.path.join(log_dir, "version_*")):
        m = re.match(r".*version_(\d+)$", p)
        if m:
            existing.append(int(m.group(1)))
    version = max(existing) + 1 if existing else 0
    path = os.path.join(log_dir, f"version_{version}")
    os.makedirs(path, exist_ok=True)
    return path


def save_hparams(version_dir: str, config) -> None:
    """hparams.yaml in the run dir (reference models.py:227 save_hyperparameters)."""
    with open(os.path.join(version_dir, "hparams.yaml"), "w") as f:
        yaml.safe_dump(config.to_dict(), f)


def best_checkpoint_in(dirname: str, higher_better: bool = True
                       ) -> Tuple[str, Dict[str, Any]]:
    """Pick the best checkpoint in a version dir by its recorded monitor score.

    Parity: reference pig/evaluation.py:42-53 (load_best_model): scan
    checkpoints/*.ckpt, read each one's monitor state, take the best
    best_model_score.
    """
    infos = []
    for path in glob.glob(os.path.join(dirname, "checkpoints", "*.ckpt")):
        meta_path = path + ".json"
        if not os.path.exists(meta_path):
            continue
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("best_model_score") is not None:
            infos.append((path, meta))
    if not infos:
        raise FileNotFoundError(f"No scored checkpoints under {dirname}")
    infos.sort(key=lambda x: x[1]["best_model_score"], reverse=higher_better)
    path, meta = infos[0]
    logging.info("Best %s: %s at %s", meta.get("monitor"),
                 meta.get("best_model_score"), path)
    return path, meta


def _is_torch_checkpoint(path: str) -> bool:
    """True for torch-saved (Lightning) .ckpt files: zip (torch>=1.6) or
    legacy pickle magic — as opposed to our msgpack checkpoints."""
    import zipfile

    if zipfile.is_zipfile(path):
        return True
    with open(path, "rb") as f:
        return f.read(2) == b"\x80\x02"


def best_torch_checkpoint_in(dirname: str, higher_better: bool = True
                             ) -> Tuple[str, Dict[str, Any]]:
    """Rank reference Lightning .ckpt files by their recorded monitor score.

    Parity: reference pig/evaluation.py:42-53 reads
    cp['callbacks'][ModelCheckpoint]['best_model_score'].  The pickled class
    key is stubbed (pytorch_lightning isn't installed), so scan the callbacks
    dict values for the checkpoint-monitor record instead.
    """
    from peppa_tpu.models.convert import load_torch_checkpoint

    infos = []
    for path in glob.glob(os.path.join(dirname, "checkpoints", "*.ckpt")):
        if not _is_torch_checkpoint(path):
            continue
        blob = load_torch_checkpoint(path)
        for item in dict(blob.get("callbacks", {})).values():
            if isinstance(item, dict) and item.get("best_model_score") is not None:
                score = float(np.asarray(item["best_model_score"]))
                infos.append((path, {
                    "monitor": item.get("monitor"),
                    "best_model_score": score,
                    "best_model_path": item.get("best_model_path"),
                }))
                break
    if not infos:
        raise FileNotFoundError(f"No scored torch checkpoints under {dirname}")
    infos.sort(key=lambda x: x[1]["best_model_score"], reverse=higher_better)
    path, meta = infos[0]
    # best_model_path was recorded on the training machine; if a same-named
    # file exists here, prefer it (reference evaluation.py:51-52 semantics)
    recorded = meta.get("best_model_path")
    if recorded:
        local = os.path.join(dirname, "checkpoints", os.path.basename(recorded))
        if os.path.exists(local):
            path = local
    logging.info("Best %s: %s at %s", meta.get("monitor"),
                 meta.get("best_model_score"), path)
    return path, meta


def load_best_model(dirname: str, higher_better: bool = True):
    """Rebuild the model from the best checkpoint in `dirname`.

    Returns (model, variables, config, checkpoint_path) — the functional
    equivalent of reference pig/evaluation.py:42-53.  Handles BOTH our
    msgpack checkpoints and reference-trained Lightning .ckpt dirs (the
    latter through models/convert.py::load_peppa_checkpoint).
    """
    from peppa_tpu.config import Config
    from peppa_tpu.models.dual_encoder import PeppaPig

    try:
        path, meta = best_checkpoint_in(dirname, higher_better)
    except FileNotFoundError:
        from peppa_tpu.models.convert import load_peppa_checkpoint

        path, meta = best_torch_checkpoint_in(dirname, higher_better)
        config = None
        hparams_path = os.path.join(dirname, "hparams.yaml")
        if os.path.exists(hparams_path):
            config = Config.load(hparams_path)
        model, variables, config, _ = load_peppa_checkpoint(path, config)
        return model, variables, config, path
    hparams_path = os.path.join(dirname, "hparams.yaml")
    config = Config.load(hparams_path)
    params, batch_stats, _ = load_params(path)
    model = PeppaPig(config)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return model, variables, config, path
