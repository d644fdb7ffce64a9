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
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import yaml
from flax import serialization


_SNAPSHOT_COPY = None


def _start_fetch(state):
    """Snapshot the train state as a payload tree and kick off async
    device->host copies for every leaf.

    Two-stage design, both stages required:

    1. ONE jitted device-side copy into FRESH buffers (`jnp.copy` per leaf;
       a real `copy` primitive, so XLA allocates new outputs).  The original
       state buffers are donated by the next train step the moment training
       resumes, and jax marks donated arrays deleted at dispatch time — a
       background writer materializing the originals then dies with
       "RuntimeError: Array has been deleted" (observed mid-run on
       hardware).  The copy runs at HBM speed and is over before the loop
       continues.
    2. copy_to_host_async for ALL leaves before gathering any of them
       overlaps the ~700 per-leaf transfers; a per-leaf np.asarray would
       serialize one device round trip per leaf, which on a remote/tunneled
       PJRT link turns a 2 GB state fetch into minutes.
    """
    global _SNAPSHOT_COPY
    import jax
    import jax.numpy as jnp

    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": serialization.to_state_dict(state.opt_state),
    }
    if jax.process_count() > 1:
        # multi-host: the copy must run on EVERY process (SPMD), and leaves
        # sharded across hosts (tensor parallelism) are not addressable from
        # any single process — so the snapshot all-gathers to fully
        # replicated outputs over ICI, after which each process (and in
        # particular the one that writes) can materialize locally.
        payload = _replicating_snapshot(payload)
    else:
        if _SNAPSHOT_COPY is None:
            _SNAPSHOT_COPY = jax.jit(
                lambda tree: jax.tree.map(jnp.copy, tree))
        payload = _SNAPSHOT_COPY(payload)
    for leaf in jax.tree.leaves(payload):
        try:
            leaf.copy_to_host_async()
        except AttributeError:
            pass
    return payload


_SNAPSHOT_REPL: Dict[Any, Any] = {}


def _replicating_snapshot(payload):
    """Jitted copy with fully-replicated out_shardings (multi-host saves)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = None
    for leaf in jax.tree.leaves(payload):
        s = getattr(leaf, "sharding", None)
        if isinstance(s, NamedSharding):
            mesh = s.mesh
            break
    if mesh is None:  # no sharded leaves: the plain copy suffices
        return jax.jit(lambda tree: jax.tree.map(jnp.copy, tree))(payload)
    fn = _SNAPSHOT_REPL.get(mesh)
    if fn is None:
        fn = jax.jit(lambda tree: jax.tree.map(jnp.copy, tree),
                     out_shardings=NamedSharding(mesh, PartitionSpec()))
        _SNAPSHOT_REPL[mesh] = fn
    return fn(payload)


def _materialize(payload):
    """Block until the async copies land; return a pure-numpy tree."""
    import jax

    return jax.tree.map(np.asarray, jax.device_get(payload))


def _publish(blob: bytes, jobs: Sequence[Tuple[str, Dict[str, Any]]],
             removals: Sequence[str] = ()) -> None:
    """Write one serialized checkpoint blob to several paths.

    Each path is written via tmp + os.replace (atomic, crash-safe); the
    second and later paths hard-link the first so a 3-way save (two monitors
    + last) costs one disk write.  Rewrites always allocate a fresh inode,
    so shared links never see another path's later content.
    """
    for stale in removals:
        for p in (stale, stale + ".json"):
            if os.path.exists(p):
                os.remove(p)
    first: Optional[str] = None
    for path, meta in jobs:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp~"
        if os.path.exists(tmp):
            os.remove(tmp)
        if first is None:
            with open(tmp, "wb") as f:
                f.write(blob)
            first = path
        else:
            os.link(first, tmp)
        os.replace(tmp, path)
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=2)


def save_checkpoint(path: str, state, meta: Dict[str, Any],
                    write: bool = True) -> None:
    """Snapshot + write `state`.  Under multi-host, call on EVERY process
    (the snapshot is a collective program) with write=True only on the
    process that owns the file."""
    payload = _start_fetch(state)
    if not write:
        return
    blob = serialization.msgpack_serialize(_materialize(payload))
    _publish(blob, [(path, meta)])


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

    def decide(self, metrics: Dict[str, float], epoch: int
               ) -> Optional[Tuple[str, List[str]]]:
        """Update best-score bookkeeping; return (new_path, stale_paths) if
        this epoch improved the monitor, else None.  File I/O is the
        caller's job so saves can run on a background writer in order."""
        if self.monitor not in metrics:
            return None
        score = float(metrics[self.monitor])
        if not self.improved(score):
            return None
        removals = [self.best_path] if self.best_path else []
        fname = f"epoch={epoch}-{self.monitor}={score:.2f}.ckpt"
        path = os.path.join(self.dirpath, fname)
        self.best_score = score
        self.best_path = path
        return path, removals

    def update(self, state, metrics: Dict[str, float], epoch: int) -> Optional[str]:
        """Synchronous single-monitor save (decide + write in one call)."""
        decision = self.decide(metrics, epoch)
        if decision is None:
            return None
        path, removals = decision
        payload = _materialize(_start_fetch(state))
        blob = serialization.msgpack_serialize(payload)
        _publish(blob, [(path, self.meta_dict(epoch, metrics))], removals)
        logging.info("Saved best %s=%.4f to %s", self.monitor,
                     self.best_score, path)
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
    """The reference's dual-monitor + last policy (run.py:32-55).

    TPU-native: each validation end snapshots the state ONCE (async
    device->host copies issued inline, so donated train buffers stay
    consistent), then a single background writer thread materializes,
    serializes, and publishes every due file (improved monitors + last)
    from that one snapshot — the next epoch trains while the multi-GB
    checkpoint write streams out.  `wait()` joins and re-raises."""

    def __init__(self, version_dir: str,
                 monitors: Tuple[str, ...] = ("valnarr_rec_fixed", "valnarr_triplet"),
                 async_saves: bool = True, write: bool = True):
        """`write=False` is the non-main multi-host mode: the manager keeps
        monitor bookkeeping in lockstep and PARTICIPATES in every snapshot
        (the device-side copy is a collective program every process must
        dispatch) but never touches the filesystem."""
        self.write = write
        self.ckpt_dir = os.path.join(version_dir, "checkpoints")
        if write:
            os.makedirs(self.ckpt_dir, exist_ok=True)
        self.monitors = [CheckpointMonitor(self.ckpt_dir, m) for m in monitors]
        self._executor = (ThreadPoolExecutor(max_workers=1,
                                             thread_name_prefix="ckpt-writer")
                          if async_saves and write else None)
        self._pending: List[Future] = []

    def restore_monitor_state(self, monitors_meta) -> None:
        """Reference parity: Lightning's resume restores ModelCheckpoint
        callback state, so a resumed run never demotes an earlier best
        (reference run.py:32-55 + Trainer(resume_from_checkpoint=...)).
        `monitors_meta` is the "monitors" list a last/preempted checkpoint
        sidecar records.  Only best_model_score carries over — best_path may
        live in the previous run's version dir and is never deleted across
        dirs; the first improvement in THIS run writes a fresh best file.
        """
        by_name = {m.get("monitor"): m for m in monitors_meta or []}
        for m in self.monitors:
            meta = by_name.get(m.monitor)
            if meta and meta.get("best_model_score") is not None:
                m.best_score = float(meta["best_model_score"])
                logging.info("Resume: restored monitor %s best=%.4f",
                             m.monitor, m.best_score)

    @staticmethod
    def resume_monitors_meta(resume_from: str,
                             resume_meta: Dict[str, Any]) -> List[Dict[str, Any]]:
        """The monitors list to restore when resuming from `resume_from`.

        last/preempted/emergency sidecars carry an explicit "monitors" list;
        a best-monitor checkpoint's sidecar is a single
        CheckpointMonitor.meta_dict (monitor/mode/best_model_score) — for
        those, merge in the sibling monitors' sidecars from the same
        checkpoints dir so a resume from EITHER best file restores BOTH
        monitors' bests and the first post-resume validation can't demote
        the real best.
        """
        if resume_meta.get("monitors"):
            return resume_meta["monitors"]
        if not resume_meta.get("monitor"):
            return []
        metas = {resume_meta["monitor"]: resume_meta}
        for p in sorted(glob.glob(os.path.join(
                os.path.dirname(resume_from), "*.ckpt.json"))):
            try:
                with open(p) as f:
                    m = json.load(f)
            except (OSError, ValueError):
                continue
            if m.get("monitor") and m["monitor"] not in metas:
                metas[m["monitor"]] = m
        return list(metas.values())

    def monitor_state(self) -> List[Dict[str, Any]]:
        """Current best-score bookkeeping, for resumable-checkpoint metas
        (preempted/emergency saves) — the restore side is
        restore_monitor_state."""
        return [{"monitor": m.monitor, "mode": m.mode,
                 "best_model_score": m.best_score,
                 "best_model_path": m.best_path} for m in self.monitors]

    def on_validation_end(self, state, metrics: Dict[str, float], epoch: int,
                          epoch_batch_offset: int = 0) -> None:
        """`epoch` = last fully trained epoch; `epoch_batch_offset` = micro-
        steps of epoch+1 this state has additionally trained (mid-epoch
        validations) — recorded in last.ckpt so a crash-resume from it is
        step-accurate (training/loop.py resume path)."""
        jobs: List[Tuple[str, Dict[str, Any]]] = []
        removals: List[str] = []
        for m in self.monitors:
            decision = m.decide(metrics, epoch)
            if decision is not None:
                path, stale = decision
                jobs.append((path, m.meta_dict(epoch, metrics)))
                removals.extend(stale)
                if self.write:
                    logging.info("Saving best %s=%.4f to %s", m.monitor,
                                 m.best_score, path)
        # save_last=True
        jobs.append((os.path.join(self.ckpt_dir, "last.ckpt"), {
            "monitor": None,
            "best_model_score": None,
            "epoch": epoch,
            "epoch_batch_offset": int(epoch_batch_offset),
            "metrics": {k: float(v) for k, v in metrics.items()},
            "monitors": [m.meta_dict(epoch, metrics) for m in self.monitors],
        }))
        # backpressure: at most ONE save in flight, enforced BEFORE taking
        # the new snapshot.  Each job pins a full device-side state copy
        # (params + both optimizer moments) plus its serialized host blob —
        # with a small val_check_interval and a slow destination disk,
        # unbounded queuing would OOM HBM or the host instead of throttling
        # the training thread.
        if self._executor is not None:
            self._reap(block=len(self._pending) >= 1)
        payload = _start_fetch(state)
        if not self.write:
            # non-main multi-host process: participated in the collective
            # snapshot above; the writing process owns the files
            return

        def write() -> None:
            blob = serialization.msgpack_serialize(_materialize(payload))
            _publish(blob, jobs, removals)

        if self._executor is None:
            write()
        else:
            self._pending.append(self._executor.submit(write))

    def wait(self) -> None:
        """Join all in-flight checkpoint writes; re-raise the first failure."""
        self._reap(block=True)

    def _reap(self, block: bool) -> None:
        still: List[Future] = []
        for f in self._pending:
            if block or f.done():
                f.result()  # raises if the writer failed
            else:
                still.append(f)
        self._pending = still


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


def find_preempted_checkpoint(config, log_dir: str = "lightning_logs"
                              ) -> Optional[str]:
    """Newest `checkpoints/preempted.ckpt` under `log_dir` from a run of the
    SAME config (hparams.yaml equality, ignoring git_commit), or None.

    This is the scheduler-requeue half of graceful preemption
    (training/preemption.py): `run.py --auto_resume` calls this at startup so
    a requeued job picks up exactly where its preempted predecessor stopped,
    without the scheduler script having to thread checkpoint paths around.
    Runs with different seeds or ablation settings never match each other,
    so concurrent job arrays sharing one log_dir resume only their own work.
    """
    from peppa_tpu.config import Config

    def _comparable(d: Dict[str, Any]) -> Dict[str, Any]:
        d = dict(d)
        d.pop("git_commit", None)
        return d

    want = _comparable(config.to_dict())
    candidates: List[Tuple[float, str]] = []
    for vdir in glob.glob(os.path.join(log_dir, "version_*")):
        path = os.path.join(vdir, "checkpoints", "preempted.ckpt")
        hparams = os.path.join(vdir, "hparams.yaml")
        if not (os.path.exists(path) and os.path.exists(hparams)):
            continue
        try:
            saved = _comparable(Config.load(hparams).to_dict())
        except Exception:  # unreadable/foreign hparams: not a candidate
            continue
        if saved == want:
            candidates.append((os.path.getmtime(path), path))
    return max(candidates)[1] if candidates else None


def consume_preempted_checkpoint(path: str) -> None:
    """Mark an auto-resumed preempted.ckpt as used (rename, keep the data)
    so the next --auto_resume run of this config starts fresh."""
    for p in (path, path + ".json"):
        if os.path.exists(p):
            os.replace(p, p + ".consumed")


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
