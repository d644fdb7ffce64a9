"""Packed clip-cache format: one memory-mappable file for a whole dataset.

The reference caches one torch pickle per clip (pig/data.py:201-234,
items-*/{i}.pt) and pays a deserialization per item per epoch.  The packed
format here holds every item's raw payload (uint8 video frames, f32 audio)
behind a fixed-size index, so the native loader (peppa_tpu/native) can mmap
it and assemble padded batches with pure memcpy — no pickle, no decode, page
cache shared across worker threads.

Layout (little-endian — mirrored by native/src/peppa_loader.cpp):

    header:  magic 'PPKC' u32 | version u32 | n_items u64
    index:   n_items x { video_off u64 | t,h,w,c u32 | audio_off u64 | s u64 |
                         video_duration f32 | audio_duration f32 }
    payload: concatenated video uint8 blobs and audio sample blobs

Version 1 stores audio samples as f32.  Version 2 stores int16
(i = round(clip(f, -1, 1) * 32768)): the exact inverse of the
16-bit-wav -> float scaling the decode path applies, so packing real media
round-trips bit-exactly while halving audio bytes on disk AND over the
host->device link (the audio encoder converts int16 on device, like uint8
video — models/wav2vec2.py).
"""

from __future__ import annotations

import os
import struct
from typing import Iterable, Iterator, Optional, Tuple

import numpy as np

from peppa_tpu.data.types import Clip

MAGIC = 0x434B5050  # "PPKC"
VERSION = 1
VERSION_I16 = 2
AUDIO_I16_SCALE = 32768.0  # moviepy/wav 16-bit <-> float scaling
_HEADER = struct.Struct("<IIQ")
_ENTRY = struct.Struct("<QIIIIQQff")


def write_pack(path: str, clips: Iterable[Clip],
               audio_int16: bool = False) -> int:
    """Write clips into a pack file; returns the item count.

    Video is stored uint8 (input float in [0,1] is quantized x255 — the same
    quantization the .npz item cache applies); audio is stored f32, or int16
    when `audio_int16` (version 2; bit-exact for 16-bit-origin media, and
    int16 input audio passes through untouched).
    """
    items = []
    # pid-suffixed temp names: under multi-host training every process
    # materializes the pack (datamodule._native_train_batches), and fixed
    # ".tmp"/".payload" names would have concurrent writers truncating each
    # other's files mid-write.  Each writer builds privately; the atomic
    # os.replace publish at the end makes the last finisher win with a
    # complete, valid pack either way.
    tmp = path + f".tmp-{os.getpid()}"
    payload_tmp = path + f".payload-{os.getpid()}"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        n = _write_pack_to(tmp, payload_tmp, clips, items, audio_int16)
    except BaseException:
        for p in (tmp, payload_tmp):
            try:
                os.remove(p)
            except OSError:
                pass
        raise
    os.replace(tmp, path)
    return n


def _write_pack_to(tmp: str, payload_tmp: str, clips: Iterable[Clip],
                   items: list, audio_int16: bool = False) -> int:
    with open(tmp, "wb") as f:
        f.write(b"\x00" * _HEADER.size)  # placeholder; index written later

        # first pass: buffer payloads in-file after a seek once count known is
        # impossible for a streaming iterable — so collect entries and write
        # payloads to a side file region after the fact.
        # Simpler: materialize payload bytes sequentially in a second file
        # section; we must know n_items to place the index, so spool payloads
        # to a temp file and concatenate.
        with open(payload_tmp, "wb") as pf:
            pos = 0
            for clip in clips:
                video = clip.video
                if video.dtype != np.uint8:
                    video = (np.clip(video, 0.0, 1.0) * 255.0).astype(np.uint8)
                if audio_int16:
                    a = np.asarray(clip.audio).reshape(-1)
                    if a.dtype == np.int16:
                        audio = np.ascontiguousarray(a)
                    else:
                        audio = np.clip(
                            np.round(a.astype(np.float64) * AUDIO_I16_SCALE),
                            -32768, 32767).astype(np.int16)
                else:
                    audio = np.ascontiguousarray(clip.audio,
                                                 dtype=np.float32).reshape(-1)
                t, h, w, c = video.shape
                v_off = pos
                pf.write(np.ascontiguousarray(video).tobytes())
                pos += video.nbytes
                a_off = pos
                pf.write(audio.tobytes())
                pos += audio.nbytes  # bytes-per-sample follows the version
                items.append((v_off, t, h, w, c, a_off, audio.shape[0],
                              float(clip.video_duration),
                              float(clip.audio_duration)))
        base = _HEADER.size + _ENTRY.size * len(items)
        f.seek(0)
        f.write(_HEADER.pack(MAGIC, VERSION_I16 if audio_int16 else VERSION,
                             len(items)))
        for (v_off, t, h, w, c, a_off, s, vd, ad) in items:
            f.write(_ENTRY.pack(base + v_off, t, h, w, c, base + a_off, s,
                                vd, ad))
        with open(payload_tmp, "rb") as pf:
            while True:
                chunk = pf.read(1 << 24)
                if not chunk:
                    break
                f.write(chunk)
        os.remove(payload_tmp)
    return len(items)


class PackReader:
    """numpy/mmap reader of the pack format (pure-Python fallback path)."""

    def __init__(self, path: str):
        self.path = path
        self._mm = np.memmap(path, dtype=np.uint8, mode="r")
        magic, version, n = _HEADER.unpack_from(self._mm[:_HEADER.size].tobytes())
        if magic != MAGIC or version not in (VERSION, VERSION_I16):
            raise ValueError(f"not a pack file: {path}")
        self.version = version
        self.audio_dtype = np.int16 if version == VERSION_I16 else np.float32
        self.n_items = n
        raw = self._mm[_HEADER.size:_HEADER.size + _ENTRY.size * n].tobytes()
        self._entries = [_ENTRY.unpack_from(raw, i * _ENTRY.size)
                         for i in range(n)]

    def __len__(self) -> int:
        return self.n_items

    def meta(self, i: int) -> Tuple[Tuple[int, int, int, int], int, float, float]:
        v_off, t, h, w, c, a_off, s, vd, ad = self._entries[i]
        return (t, h, w, c), s, vd, ad

    def __getitem__(self, i: int) -> Clip:
        v_off, t, h, w, c, a_off, s, vd, ad = self._entries[i]
        video = np.asarray(self._mm[v_off:v_off + t * h * w * c]
                           ).reshape(t, h, w, c)
        bps = np.dtype(self.audio_dtype).itemsize
        audio = np.frombuffer(self._mm[a_off:a_off + s * bps].tobytes(),
                              dtype=self.audio_dtype)
        # uint8 video / int16 audio straight through: the encoders convert
        # on device (4x / 2x less host->device traffic than float)
        return Clip(video=video, audio=audio,
                    video_duration=vd, audio_duration=ad, index=i)

    def raw_video(self, i: int) -> np.ndarray:
        v_off, t, h, w, c, *_ = self._entries[i]
        return np.asarray(self._mm[v_off:v_off + t * h * w * c]
                          ).reshape(t, h, w, c)

    def durations(self) -> np.ndarray:
        return np.asarray([(e[7], e[8]) for e in self._entries], np.float32)


def pack_from_dataset(dataset, path: str, audio_int16: bool = False) -> int:
    """Materialize any Clip-iterable dataset (e.g. PeppaPigDataset) as a pack."""
    return write_pack(path, iter(dataset), audio_int16=audio_int16)
