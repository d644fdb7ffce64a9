"""ctypes bindings for the native loader (src/peppa_loader.cpp).

`NativePack` mmaps a packed cache (data/cache.py format); `NativeBatchLoader`
drives the C++ worker pool that assembles padded uint8/f32 batches in
background threads and yields them as ClipBatch (video left uint8 — the model
normalizes on device, so host->device traffic is 1/4 of float).
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import Iterator, Optional, Sequence

import numpy as np

from peppa_tpu.data.types import ClipBatch


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    from peppa_tpu.native.build import build

    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.ppk_open.restype = ctypes.c_void_p
    lib.ppk_open.argtypes = [ctypes.c_char_p]
    lib.ppk_close.argtypes = [ctypes.c_void_p]
    lib.ppk_len.restype = ctypes.c_uint64
    lib.ppk_len.argtypes = [ctypes.c_void_p]
    lib.ppk_version.restype = ctypes.c_uint32
    lib.ppk_version.argtypes = [ctypes.c_void_p]
    lib.ppk_item_meta.restype = ctypes.c_int
    lib.ppk_item_meta.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                  ctypes.POINTER(ctypes.c_uint64),
                                  ctypes.POINTER(ctypes.c_float)]
    lib.ppk_item_data.restype = ctypes.c_int
    lib.ppk_item_data.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                  ctypes.c_void_p, ctypes.c_void_p]
    lib.ppk_loader_new.restype = ctypes.c_void_p
    lib.ppk_loader_new.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_uint64, ctypes.c_uint32,
                                   ctypes.c_uint32]
    lib.ppk_loader_next.restype = ctypes.c_int64
    lib.ppk_loader_next.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
    lib.ppk_loader_free.argtypes = [ctypes.c_void_p]
    return lib


def native_available() -> bool:
    return _lib() is not None


class NativePack:
    """mmap'd packed clip cache, served by the C++ runtime."""

    def __init__(self, path: str):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native loader library unavailable")
        self._lib = lib
        self._handle = lib.ppk_open(path.encode())
        if not self._handle:
            raise IOError(f"cannot open pack {path}")
        self.path = path
        self.version = int(lib.ppk_version(self._handle))
        # v2 packs ship int16 audio straight to the device (the audio
        # encoder converts, models/wav2vec2.py); v1 ships f32
        self.audio_dtype = np.int16 if self.version == 2 else np.float32

    def __len__(self) -> int:
        return int(self._lib.ppk_len(self._handle))

    def meta(self, i: int):
        m = (ctypes.c_uint64 * 5)()
        d = (ctypes.c_float * 2)()
        if self._lib.ppk_item_meta(self._handle, i, m, d) != 0:
            raise IndexError(i)
        return (int(m[0]), int(m[1]), int(m[2]), int(m[3])), int(m[4]), \
            float(d[0]), float(d[1])

    def item(self, i: int):
        (t, h, w, c), s, vd, ad = self.meta(i)
        video = np.empty((t, h, w, c), np.uint8)
        audio = np.empty((s,), self.audio_dtype)
        rc = self._lib.ppk_item_data(
            self._handle, i, video.ctypes.data_as(ctypes.c_void_p),
            audio.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise IndexError(i)
        return video, audio, vd, ad

    def durations(self) -> np.ndarray:
        return np.asarray([self.meta(i)[2:] for i in range(len(self))],
                          np.float32)

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.ppk_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class NativeBatchLoader:
    """Iterator over padded batches assembled by the C++ worker pool.

    `plan` is a sequence of (item_indices, (pad_t, pad_h, pad_w, pad_c, pad_s))
    — one entry per batch, shapes static per batch (XLA bucket shapes).
    """

    def __init__(self, pack: NativePack, plan: Sequence,
                 n_threads: int = 4, depth: int = 4):
        self._pack = pack
        self._lib = pack._lib
        self._plan = list(plan)
        items = np.concatenate([np.asarray(p[0], np.int64)
                                for p in self._plan]) if self._plan else \
            np.zeros((0,), np.int64)
        sizes = np.asarray([len(p[0]) for p in self._plan], np.int64)
        pads = np.asarray([list(p[1]) for p in self._plan], np.int64).reshape(-1)
        self._items, self._sizes, self._pads = items, sizes, pads  # keepalive
        self._handle = self._lib.ppk_loader_new(
            pack._handle,
            items.ctypes.data_as(ctypes.c_void_p),
            sizes.ctypes.data_as(ctypes.c_void_p),
            pads.ctypes.data_as(ctypes.c_void_p),
            len(self._plan), n_threads, depth)

    def __len__(self) -> int:
        return len(self._plan)

    def __iter__(self) -> Iterator[ClipBatch]:
        for idx_list, (pt, ph, pw, pc, ps) in self._plan:
            b = len(idx_list)
            video = np.empty((b, pt, ph, pw, pc), np.uint8)
            audio = np.empty((b, ps), self._pack.audio_dtype)
            vdur = np.empty((b,), np.float32)
            adur = np.empty((b,), np.float32)
            vframes = np.empty((b,), np.int32)
            asamples = np.empty((b,), np.int64)
            got = self._lib.ppk_loader_next(
                self._handle,
                video.ctypes.data_as(ctypes.c_void_p),
                audio.ctypes.data_as(ctypes.c_void_p),
                vdur.ctypes.data_as(ctypes.c_void_p),
                adur.ctypes.data_as(ctypes.c_void_p),
                vframes.ctypes.data_as(ctypes.c_void_p),
                asamples.ctypes.data_as(ctypes.c_void_p))
            if got < 0:
                return
            yield ClipBatch(video=video, audio=audio,
                            video_duration=vdur, audio_duration=adur,
                            video_frames=vframes,
                            audio_samples=asamples.astype(np.int32))

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.ppk_loader_free(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def bucket_plan(durations: np.ndarray, buckets: Sequence[float],
                batch_size: int, target_hw: tuple, sample_rate: int,
                fps: float = 10.0, shuffle: bool = False, seed: int = 0,
                drop_last: bool = True):
    """Build a NativeBatchLoader plan: duration-bucketed, static pad shapes.

    Mirrors data/dataset.py bucketed_batches so the native and Python loaders
    produce identical batch structure.
    """
    w, h = target_hw
    order = np.arange(len(durations))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    pending = {b: [] for b in buckets}
    plan = []
    for j in order:
        d = max(durations[j][0], durations[j][1])
        b = next((bk for bk in buckets if d <= bk), buckets[-1])
        pending[b].append(int(j))
        if len(pending[b]) == batch_size:
            plan.append((pending[b],
                         (int(round(b * fps)), h, w, 3,
                          int(round(b * sample_rate)))))
            pending[b] = []
    if not drop_last:
        for b, items in pending.items():
            if items:
                plan.append((items, (int(round(b * fps)), h, w, 3,
                                     int(round(b * sample_rate)))))
    return plan
