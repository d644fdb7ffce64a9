"""Targeted (minimal-pairs) triplet datasets and scoring.

Capability parity: reference pig/targeted_triplets.py +
evaluation_targeted_triplets.py:34-81 —
- `PeppaTargetedTripletDataset.from_csv`: read data/eval/eval_set_{frag}_{pos}.csv,
  cut the paired clips from the full episodes, pair each sample with its
  counterexample (reference targeted_triplets.py:70-159);
- `PeppaTargetedTripletCachedDataset`: featurized Triplet cache; the
  scrambled_video control permutes frames of both videos independently
  (reference targeted_triplets.py:35-61);
- `targeted_triplet_score`: per-sample triplet accuracy via the model's
  TripletBatch forward (reference evaluation_targeted_triplets.py:67-81).

Clip cutting needs a media decode backend (OpenCV/ffmpeg, gated); the cached
path (.npz triplets) runs anywhere.
"""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from peppa_tpu.data import decode as D
from peppa_tpu.data.dataset import atomic_cache_build, pad_to
from peppa_tpu.data.types import Triplet, TripletBatch

FPS = 10  # reference targeted_triplets.py:16


def get_eval_set_info(fragment: str, pos: str, data_dir: str = "data"):
    """Load the eval-set CSV (reference targeted_triplets.py:64-67)."""
    import pandas as pd

    return pd.read_csv(
        os.path.join(data_dir, "eval", f"eval_set_{fragment}_{pos}.csv"),
        index_col="id")


class PeppaTargetedTripletDataset:
    """Cuts and serves (target, distractor) clip pairs from the eval CSV."""

    def __init__(self, directory: str, target_size: Tuple[int, int] = (180, 100),
                 audio_sample_rate: int = 44100):
        self.directory = directory
        self.target_size = tuple(target_size)
        self.audio_sample_rate = audio_sample_rate
        self._clip_info = {}
        self._sample: List[Tuple[dict, dict]] = []

    @classmethod
    def from_csv(cls, fragment: str, pos: str,
                 target_size: Tuple[int, int] = (180, 100),
                 audio_sample_rate: int = 44100,
                 data_dir: str = "data") -> "PeppaTargetedTripletDataset":
        directory = os.path.join(
            data_dir, "out", f"val_{fragment}_targeted_triplets_{pos}")
        self = cls(directory, target_size, audio_sample_rate)
        info = get_eval_set_info(fragment, pos, data_dir)
        self._load_eval_set_and_save_clip_info(info)
        self._sample = list(self.sample())
        self._save_sample()
        return self

    def _load_eval_set_and_save_clip_info(self, eval_set_info) -> None:
        os.makedirs(self.directory, exist_ok=True)
        self._clip_info = {}
        for id_, sample in eval_set_info.iterrows():
            path_example = os.path.join(self.directory, f"{id_}.npz")
            start, end = float(sample["clipStart"]), float(sample["clipEnd"])
            video = D.decode_video_frames(sample["episode_filepath"], start, end,
                                          self.target_size)
            audio = D.decode_audio(sample["episode_filepath"], start, end,
                                   self.audio_sample_rate)
            D.save_clip_npz(path_example,
                            (np.clip(video, 0, 1) * 255).astype(np.uint8),
                            audio, fps=FPS, sample_rate=self.audio_sample_rate)
            self._clip_info[id_] = dict(
                path=path_example,
                transcript=sample.get("transcript"),
                target_word=sample.get("target_word"),
                distractor_word=sample.get("distractor_word"),
                id_counterexample=int(sample["id_counterexample"]),
                audio_start=start, audio_end=end,
                duration=end - start)
        with open(os.path.join(self.directory, "clip_info.json"), "w") as f:
            json.dump({str(k): v for k, v in self._clip_info.items()}, f, indent=2)

    def sample(self) -> Iterator[Tuple[dict, dict]]:
        for item in self._clip_info.values():
            yield (item, self._clip_info[item["id_counterexample"]])

    def _save_sample(self) -> None:
        with open(os.path.join(self.directory, "sample.json"), "w") as f:
            json.dump(self._sample, f, indent=2)

    def __len__(self) -> int:
        return len(self._sample)

    def __getitem__(self, idx: int) -> Triplet:
        target_info, distractor_info = self._sample[idx]
        pos_clip = D.load_clip_npz(target_info["path"])
        neg_clip = D.load_clip_npz(distractor_info["path"])
        return Triplet(anchor=pos_clip.audio, positive=pos_clip.video,
                       negative=neg_clip.video,
                       audio_duration=pos_clip.audio_duration,
                       video_duration=pos_clip.video_duration)


class PeppaTargetedTripletCachedDataset:
    """Featurized triplet cache (reference targeted_triplets.py:35-61)."""

    def __init__(self, fragment: str, pos: str,
                 target_size: Tuple[int, int] = (180, 100),
                 audio_sample_rate: int = 44100, force_cache: bool = False,
                 scrambled_video: bool = False, data_dir: str = "data",
                 scramble_seed: Optional[int] = None):
        self.cache_dir = os.path.join(
            data_dir, "out",
            f"items-targeted-triplets-{target_size[0]}-{target_size[1]}-"
            f"{fragment}-{audio_sample_rate}-{pos}")
        def build(tmp: str) -> None:
            ds = PeppaTargetedTripletDataset.from_csv(
                fragment, pos, target_size, audio_sample_rate, data_dir)
            for i in range(len(ds)):
                item = ds[i]
                logging.info("Caching item %s/%d.npz", self.cache_dir, i)
                np.savez(os.path.join(tmp, f"{i}.npz"),
                         anchor=item.anchor.astype(np.float32),
                         positive=(np.clip(item.positive, 0, 1) * 255).astype(np.uint8),
                         negative=(np.clip(item.negative, 0, 1) * 255).astype(np.uint8),
                         audio_duration=np.float32(item.audio_duration or 0),
                         video_duration=np.float32(item.video_duration or 0))

        # same atomic publish + no-silent-empty + concurrent-builder contract
        # as the clip item cache (data/dataset.py::atomic_cache_build)
        atomic_cache_build(self.cache_dir, build, force=force_cache)
        self.length = len(glob.glob(os.path.join(self.cache_dir, "*.npz")))
        self.scrambled_video = scrambled_video
        self._rng = np.random.default_rng(scramble_seed)

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Triplet:
        with np.load(os.path.join(self.cache_dir, f"{idx}.npz")) as z:
            # videos stay uint8 host->device; the encoders fuse /255 on
            # device, bit-identically to re-floating here
            item = Triplet(
                anchor=z["anchor"].astype(np.float32),
                positive=z["positive"],
                negative=z["negative"],
                audio_duration=float(z["audio_duration"]),
                video_duration=float(z["video_duration"]))
        if self.scrambled_video:
            # shuffle both videos along time, independently
            # (reference targeted_triplets.py:54-61)
            item.positive = item.positive[self._rng.permutation(item.positive.shape[0])]
            item.negative = item.negative[self._rng.permutation(item.negative.shape[0])]
        return item


def collate_triplets(items: Sequence[Triplet]) -> TripletBatch:
    """Pad-and-stack (reference targeted_triplets.py:162-166)."""
    smax = max(x.anchor.shape[0] for x in items)
    tp = max(x.positive.shape[0] for x in items)
    tn = max(x.negative.shape[0] for x in items)
    t = max(tp, tn)
    return TripletBatch(
        anchor=np.stack([pad_to(x.anchor, smax, 0) for x in items]),
        positive=np.stack([pad_to(x.positive, t, 0) for x in items]),
        negative=np.stack([pad_to(x.negative, t, 0) for x in items]))


def targeted_triplet_score(fragment: str, pos: str, predict_fn: Callable,
                           batch_size: int = 8, scrambled_video: bool = False,
                           target_size: Tuple[int, int] = (180, 100),
                           audio_sample_rate: int = 44100,
                           data_dir: str = "data") -> np.ndarray:
    """Per-sample triplet accuracy (reference evaluation_targeted_triplets.py:67-81)."""
    from peppa_tpu.ops.metrics import triplet_accuracy

    ds = PeppaTargetedTripletCachedDataset(
        fragment, pos, target_size, audio_sample_rate,
        scrambled_video=scrambled_video, data_dir=data_dir, scramble_seed=666)
    results = []
    buf: List[Triplet] = []

    def flush():
        if not buf:
            return
        batch = collate_triplets(buf)
        out = predict_fn(batch)
        acc = triplet_accuracy(np.asarray(out.anchor), np.asarray(out.positive),
                               np.asarray(out.negative))
        results.extend(np.asarray(acc).tolist())
        buf.clear()

    for i in range(len(ds)):
        buf.append(ds[i])
        if len(buf) == batch_size:
            flush()
    flush()
    return np.asarray(results)
