"""Episode extraction: cut dialog/narration subclips from full episodes.

Capability parity: reference pig/preprocess.py:10-57 (extract /
extract_from_episode): read the episode list CSV + per-episode JSON
annotations (narrator_splits[].{context,narration}.tokenized[].{begin,end}),
cut each contiguous tokenized span, resize to the target size at 10 fps, and
write per-episode clip files with sidecar metadata JSON into
data/out/{W}x{H}/{dialog,narration}/{episode}/{i}.*.

TPU-era output format: .npz clip files (uint8 frames + float32 audio) — the
rest of the pipeline decodes them with numpy alone; when only segment metadata
changes, nothing is re-encoded.  Requires a media decode backend (OpenCV for
frames; ffmpeg for audio) for the original episode files.
"""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Tuple

import numpy as np

from peppa_tpu.data import decode as D

FPS = 10  # reference pig/preprocess.py:46


def episode_titles(data_dir: str = "data"):
    """Map episode title -> video path (reference pig/preprocess.py:12-14)."""
    import pandas as pd

    csv_path = os.path.join(data_dir, "in", "peppa_pig_dataset-video_list.csv")
    data = pd.read_csv(csv_path, sep=";", quotechar="'",
                       names=["id", "title", "path"], index_col=0)
    return dict(zip(data["title"],
                    data["path"].map(
                        lambda x: os.path.join(data_dir, "in", "peppa", x[4:]))))


def extract(target_size: Tuple[int, int] = (180, 100),
            data_dir: str = "data", container: str = "npz") -> None:
    """Extract all annotated episodes (reference pig/preprocess.py:10-22).

    container='avi' writes the reference's own clip format (mpeg4 .avi +
    .json sidecar) so an extracted tree feeds back into the reference stack.
    """
    logging.basicConfig(level=logging.INFO)
    titles = episode_titles(data_dir)
    episodes = glob.glob(os.path.join(data_dir, "in", "peppa", "episodes",
                                      "*.json"))
    for path in episodes:
        with open(path) as f:
            annotation = json.load(f)
        extract_from_episode(annotation, titles[annotation["title"]],
                             target_size, data_dir, container=container)


def extract_realines(target_size: Tuple[int, int] = (180, 100),
                     data_dir: str = "data", container: str = "npz") -> None:
    """Re-cut clips around successfully force-aligned word spans.

    Parity: reference pig/preprocess.py:74-89 (extract_realines): for each
    realign JSON, cut the source episode from the first to the last
    successfully-aligned word (offset by clipStart) and write the clip beside
    the JSON (here as .npz at 10 fps instead of mpeg4 .mp4).
    """
    from itertools import groupby

    items = []
    for path in glob.glob(os.path.join(data_dir, "out", "realign", "*",
                                       "ep_*", "*", "*.json")):
        with open(path) as f:
            meta = json.load(f)
        meta["path"] = path
        if "episode_filepath" in meta:
            items.append(meta)
    items.sort(key=lambda x: x["episode_filepath"])
    for episode_path, metas in groupby(items,
                                       key=lambda x: x["episode_filepath"]):
        for meta in metas:
            fully = [w for w in meta.get("words", [])
                     if w.get("case") == "success"]
            if not fully:
                continue
            start = fully[0]["start"] + meta["clipStart"]
            end = fully[-1]["end"] + meta["clipStart"]
            video = D.decode_video_frames(episode_path, start, end,
                                          target_size=target_size)
            src_fps = video.shape[0] / max(end - start, 1e-6)
            idx = np.round(np.arange(0, video.shape[0],
                                     src_fps / FPS)).astype(int)
            video = video[idx[idx < video.shape[0]]]
            audio = D.decode_audio(episode_path, start, end)
            _write_clip(os.path.splitext(meta["path"])[0],
                        (np.clip(video, 0, 1) * 255).astype(np.uint8),
                        audio, container)


def _write_clip(path_base: str, video_uint8: np.ndarray, audio: np.ndarray,
                container: str, meta=None,
                sample_rate: int = D.DEFAULT_SAMPLE_RATE) -> str:
    """Write one clip as .npz (TPU pipeline native) or .avi (mpeg4 + PCM,
    the reference-consumable container of pig/preprocess.py:45-55, with the
    reference's {i}.json metadata sidecar)."""
    if container == "avi":
        from peppa_tpu.data.avi import write_clip_avi

        out = path_base + ".avi"
        write_clip_avi(out, video_uint8, audio, fps=FPS, rate=sample_rate)
        if meta is not None:
            with open(path_base + ".json", "w") as f:
                json.dump(meta, f)
        return out
    out = path_base + ".npz"
    D.save_clip_npz(out, video_uint8, audio, fps=FPS, meta=meta)
    return out


def extract_from_episode(annotation: dict, video_path: str,
                         target_size: Tuple[int, int],
                         data_dir: str = "data",
                         container: str = "npz") -> None:
    """Cut one episode's dialog/narration spans (reference preprocess.py:25-57)."""
    import pandas as pd

    width, height = target_size
    to_s = lambda v: float(pd.Timedelta(v).total_seconds())
    spans = {"dialog": [], "narration": []}
    for segment in annotation["narrator_splits"]:
        for kind, key in (("dialog", "context"), ("narration", "narration")):
            tokenized = segment[key]["tokenized"]
            if tokenized:
                spans[kind].append((to_s(tokenized[0]["begin"]),
                                    to_s(tokenized[-1]["end"]),
                                    segment[key]))
    for kind, items in spans.items():
        outdir = os.path.join(data_dir, "out", f"{width}x{height}", kind,
                              str(annotation["id"]))
        os.makedirs(outdir, exist_ok=True)
        for i, (begin, end, meta) in enumerate(items):
            logging.info("Writing %s %d from episode %s", kind, i,
                         annotation["id"])
            video = D.decode_video_frames(video_path, begin, end,
                                          target_size=(width, height))
            # decimate to 10 fps: the decoder returns source-fps frames
            src_fps = video.shape[0] / max(end - begin, 1e-6)
            idx = np.round(np.arange(0, video.shape[0],
                                     src_fps / FPS)).astype(int)
            idx = idx[idx < video.shape[0]]
            video = video[idx]
            audio = D.decode_audio(video_path, begin, end)
            _write_clip(os.path.join(outdir, str(i)),
                        (np.clip(video, 0, 1) * 255).astype(np.uint8),
                        audio, container, meta=meta)
