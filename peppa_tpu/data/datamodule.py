"""The data module: builds train/val datasets + loaders from a Config.

Capability parity: reference pig/data.py:348-440 (PigData LightningDataModule):
- prepare_data: optional episode extraction + normalization-stats pass;
- setup: train (dialog/train, jittered per config) and FOUR validation sets —
  val_dia / val_narr (fixed duration), val_dia3 / val_narr3 (duration=None,
  subtitle lines, for duration-matched triplet eval);
- train loader shuffled/batched; the two "*3" val loaders grouped by exact
  audio duration.

TPU-first: the train loader buckets durations to a static shape set
(config.tpu.bucket_durations) so XLA compiles once per bucket; loaders
prefetch to device asynchronously (loader.py).
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Iterator, List, Optional

import numpy as np

from peppa_tpu.config import Config
from peppa_tpu.data import decode as D
from peppa_tpu.data.dataset import (
    PeppaPigDataset,
    PeppaPigIterableDataset,
    batches,
    bucketed_batches,
    collate,
    grouped_batches,
)
from peppa_tpu.data.stats import compute_stats, save_stats
from peppa_tpu.data.types import ClipBatch
from peppa_tpu.utils import dist


def multihost_interleave(stream, shape_key: Callable, process_index: int,
                         process_count: int):
    """Regroup a deterministic batch stream for multi-host input.

    Every host iterates the SAME stream (same seed => identical order) and
    gets back one entry per *global* step such that at step t all hosts hold
    a batch of the SAME shape; the t-th global batch is the concatenation of
    all hosts' local batches (see parallel/mesh.py shard_batch). Entries are
    grouped by `shape_key` in stream order; each complete group of
    `process_count` same-shape entries emits element `process_index`.
    Incomplete trailing groups are dropped so every host sees exactly the
    same step count — a ragged tail would desynchronize hosts and deadlock
    the collectives at epoch end.
    """
    if process_count <= 1:
        yield from stream
        return
    pending = {}
    for entry in stream:
        key = shape_key(entry)
        group = pending.setdefault(key, [])
        group.append(entry)
        if len(group) == process_count:
            yield group[process_index]
            pending[key] = []


class PigData:
    """Functional data module over the extracted episode tree."""

    def __init__(self, config: Config):
        self.config = config
        self.data = config.data
        self._synthetic = None

    # -------------------------------------------------------------- prepare
    def prepare_data(self) -> None:
        if self.data.extract:
            from peppa_tpu.preprocess.extract import extract

            logging.info("Extracting data for target size %s", self.data.target_size)
            extract(self.data.target_size, data_dir=self.data.data_dir)
        if self.data.prepare:
            logging.info("Collecting stats on training data.")
            train = PeppaPigIterableDataset(
                target_size=self.data.target_size,
                audio_sample_rate=self.data.audio_sample_rate,
                split=["train"], fragment_type="dialog",
                duration=self.data.train.duration,
                jitter=self.data.train.jitter,
                jitter_sd=self.data.train.jitter_sd,
                data_dir=self.data.data_dir)
            stats = compute_stats(train)
            save_stats(os.path.join(self.data.data_dir, "out", "stats.npz"), stats)
            logging.info("Saved stats")

    # ---------------------------------------------------------------- setup
    def setup(self) -> None:
        d = self.data
        common = dict(target_size=d.target_size,
                      audio_sample_rate=d.audio_sample_rate,
                      data_dir=d.data_dir)
        if d.iterable:
            self.train = PeppaPigIterableDataset(
                split=["train"], fragment_type="dialog",
                duration=d.train.duration, jitter=d.train.jitter,
                jitter_sd=d.train.jitter_sd, **common)
        else:
            self.train = PeppaPigDataset(
                force_cache=d.train.force_cache,
                split=["train"], fragment_type="dialog",
                duration=d.train.duration, jitter=d.train.jitter,
                jitter_sd=d.train.jitter_sd, **common)
        self.val_dia = PeppaPigDataset(
            force_cache=d.val.force_cache, split=["val"], fragment_type="dialog",
            duration=d.val.duration, jitter=d.val.jitter,
            jitter_sd=d.val.jitter_sd, **common)
        self.val_narr = PeppaPigDataset(
            force_cache=d.val.force_cache, split=["val"], fragment_type="narration",
            duration=d.val.duration, jitter=d.val.jitter,
            jitter_sd=d.val.jitter_sd, **common)
        self.val_dia3 = PeppaPigDataset(
            force_cache=d.val.force_cache, split=["val"], fragment_type="dialog",
            duration=None, jitter=False, **common)
        self.val_narr3 = PeppaPigDataset(
            force_cache=d.val.force_cache, split=["val"], fragment_type="narration",
            duration=None, jitter=False, **common)

    @staticmethod
    def _host_shard() -> tuple:
        """(process_index, process_count) — multi-host input topology.

        Every host iterates the SAME deterministic batch plan; each host's
        yielded batch is its local slab of a global batch of
        process_count * batch_size rows (assembled in shard_batch via
        make_array_from_process_local_data). multihost_interleave guarantees
        identical step counts and identical shapes per step across hosts.
        """
        return dist.process_index(), dist.process_count()

    # -------------------------------------------------------------- loaders
    def train_batches(self, epoch: int = 0) -> Iterator[ClipBatch]:
        cfg = self.config
        d = self.data
        buckets = tuple(cfg.tpu.bucket_durations)
        pi, pc = self._host_shard()
        batch_shape = lambda b: (np.shape(b.video), np.shape(b.audio))
        native = self._native_train_batches(epoch)
        if native is not None:
            yield from native
        elif hasattr(self.train, "__len__"):
            # Every host loads the full deterministic stream and keeps 1/pc
            # of it (the native path below avoids the redundant loads by
            # interleaving the plan before any item is read).
            yield from multihost_interleave(
                bucketed_batches(
                    self.train, batch_size=d.train.batch_size, buckets=buckets,
                    sample_rate=d.audio_sample_rate,
                    shuffle=d.train.shuffle, seed=cfg.training.seed + epoch),
                batch_shape, pi, pc)
        else:
            # iterable: window into bucket groups on the fly
            def stream():
                pending = {b: [] for b in buckets}
                from peppa_tpu.data.dataset import bucket_for

                for item in self.train:
                    b = bucket_for(max(item.video_duration,
                                       item.audio_duration), buckets)
                    pending[b].append(item)
                    if len(pending[b]) == d.train.batch_size:
                        yield collate(
                            pending[b],
                            video_frames=int(round(b * D.FPS)),
                            audio_samples=int(round(b * d.audio_sample_rate)))
                        pending[b] = []

            yield from multihost_interleave(stream(), batch_shape, pi, pc)

    def _native_train_batches(self, epoch: int) -> Optional[Iterator[ClipBatch]]:
        """Fast path: packed cache + C++ prefetch loader (peppa_tpu/native).

        The pack is materialized once beside the item cache; afterwards every
        epoch is mmap reads + memcpy batch assembly in C++ worker threads,
        with uint8 video shipped to the device.  Falls back to the Python
        loader when the native toolchain or a cache directory is unavailable.
        """
        cfg = self.config
        d = self.data
        if not getattr(cfg.tpu, "native_loader", True):
            return None
        train = self.train
        cache_dir = getattr(train, "cache_dir", None)
        if cache_dir is None:
            return None
        try:
            from peppa_tpu.native import (NativeBatchLoader, NativePack,
                                          native_available)
            from peppa_tpu.native.loader import bucket_plan
        except Exception:
            return None
        if not native_available():
            return None
        audio_i16 = bool(getattr(cfg.tpu, "pack_audio_int16", False))
        pack_path = os.path.join(cache_dir,
                                 "items_i16.pack" if audio_i16 else "items.pack")
        if not os.path.exists(pack_path):
            from peppa_tpu.data.cache import pack_from_dataset

            logging.info("Materializing packed cache %s", pack_path)
            pack_from_dataset(train, pack_path, audio_int16=audio_i16)
        pack = NativePack(pack_path)
        plan = bucket_plan(
            pack.durations(), buckets=tuple(cfg.tpu.bucket_durations),
            batch_size=d.train.batch_size, target_hw=d.target_size,
            sample_rate=d.audio_sample_rate,
            shuffle=d.train.shuffle, seed=cfg.training.seed + epoch)
        pi, pc = self._host_shard()
        if pc > 1:
            # same plan on every host (same seed); each host takes its slot
            # from complete same-shape groups of pc batches so all hosts run
            # the same number of steps with the same shapes per step
            plan = list(multihost_interleave(
                plan, lambda p: (len(p[0]),) + tuple(p[1]), pi, pc))
        logging.info("Native loader: %d batches from %s", len(plan), pack_path)
        return iter(NativeBatchLoader(pack, plan,
                                      n_threads=max(d.num_workers, 1),
                                      depth=cfg.tpu.prefetch * 2))

    def val_loaders(self) -> List[Iterator[ClipBatch]]:
        """The 4-loader validation protocol (reference pig/data.py:422-435)."""
        d = self.data
        key = lambda x: x.audio_duration
        return [
            batches(self.val_dia, batch_size=d.val.batch_size),
            batches(self.val_narr, batch_size=d.val.batch_size),
            grouped_batches(self.val_dia3, key, batch_size=d.val.batch_size),
            grouped_batches(self.val_narr3, key, batch_size=d.val.batch_size),
        ]

    def test_loader(self, fragment_type: str = "narration") -> Iterator[ClipBatch]:
        d = self.data
        ds = PeppaPigDataset(
            force_cache=d.test.force_cache, split=["test"],
            fragment_type=fragment_type, duration=d.test.duration,
            jitter=d.test.jitter, target_size=d.target_size,
            audio_sample_rate=d.audio_sample_rate, data_dir=d.data_dir)
        return batches(ds, batch_size=d.test.batch_size)


class SyntheticPigData(PigData):
    """Drop-in PigData over synthetic clips (tests/bench without media)."""

    def __init__(self, config: Config, n_train: int = 64, n_val: int = 32,
                 seed: int = 0, n_classes: int = 8):
        super().__init__(config)
        self.n_train = n_train
        self.n_val = n_val
        self.seed = seed
        # >8 = hard-corpus knob (synthetic.correlated_pair n_classes)
        self.n_classes = n_classes

    def prepare_data(self) -> None:
        pass

    def setup(self) -> None:
        from peppa_tpu.data.synthetic import SyntheticClipDataset

        d = self.data
        dur = d.train.duration or 2.3
        rng = np.random.default_rng(self.seed)
        ts = d.target_size
        sr = d.audio_sample_rate
        k = self.n_classes
        self.train = SyntheticClipDataset([dur] * self.n_train, ts, sr,
                                          seed=self.seed, n_classes=k)
        self.val_dia = SyntheticClipDataset([d.val.duration or 2.3] * self.n_val,
                                            ts, sr, seed=self.seed + 1,
                                            n_classes=k)
        self.val_narr = SyntheticClipDataset([d.val.duration or 2.3] * self.n_val,
                                             ts, sr, seed=self.seed + 2,
                                             n_classes=k)
        line_durs = [float(x) for x in rng.integers(1, 4, size=self.n_val)]
        self.val_dia3 = SyntheticClipDataset(line_durs, ts, sr,
                                             seed=self.seed + 3, n_classes=k)
        self.val_narr3 = SyntheticClipDataset(line_durs, ts, sr,
                                              seed=self.seed + 4, n_classes=k)
