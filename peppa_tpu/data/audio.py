"""Audio-only (and video-only) loaders for analysis embeddings.

Capability parity: reference pig/data.py:87-199 — Audio{File,Clip}Dataset,
ArrayDataset, the grouped variants, and the `*_loader` factories used by
example.py and the GRSA analysis (pig/grsa.py Embedder).  These are host-side
generators (no torch DataLoader): batches are padded (S,) waveform stacks,
grouped variants batch within identical-length groups so padding is zero.
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Sequence

import numpy as np

from peppa_tpu.data import decode as D
from peppa_tpu.data.dataset import grouped, pad_to

DEFAULT_SAMPLE_RATE = D.DEFAULT_SAMPLE_RATE


def collate_audio(items: Sequence[np.ndarray]) -> np.ndarray:
    """Zero-pad (S,) waveforms to the batch max and stack -> (B, S)."""
    arrays = [np.asarray(a, np.float32).reshape(-1) for a in items]
    smax = max(a.shape[0] for a in arrays)
    return np.stack([pad_to(a, smax, 0) for a in arrays])


def audio_files(paths: Sequence[str],
                audio_sample_rate: int = DEFAULT_SAMPLE_RATE
                ) -> Iterator[np.ndarray]:
    """Decode whole audio files to mono (S,) float32 waveforms."""
    for path in paths:
        duration = D.media_duration(path) if not path.endswith(".wav") else None
        end = duration if duration is not None else 1e9
        yield D.decode_audio(path, 0.0, end, audio_sample_rate)


def _batched(items: Iterator, batch_size: int,
             collate_fn: Callable) -> Iterator:
    buf: List = []
    for item in items:
        buf.append(item)
        if len(buf) == batch_size:
            yield collate_fn(buf)
            buf = []
    if buf:
        yield collate_fn(buf)


def audiofile_loader(paths: Sequence[str], batch_size: int = 32,
                     audio_sample_rate: int = DEFAULT_SAMPLE_RATE):
    """Parity: reference pig/data.py:146-148."""
    return _batched(audio_files(paths, audio_sample_rate), batch_size,
                    collate_audio)


def audioarray_loader(arrays: Sequence[np.ndarray], batch_size: int = 32):
    """Parity: reference pig/data.py:160-162."""
    return _batched(iter(arrays), batch_size, collate_audio)


def grouped_audio_loader(items, batch_size: int = 32,
                         key: Callable = lambda x: np.asarray(x).shape[-1]):
    """Length-grouped audio batches (zero padding within each batch).

    Parity: reference pig/data.py:150-158, 172-181 (grouped_* variants).
    """
    for _, group in grouped(list(items), key=key):
        yield from _batched(iter(list(group)), batch_size, collate_audio)


def grouped_audiofile_loader(paths: Sequence[str], batch_size: int = 32,
                             audio_sample_rate: int = DEFAULT_SAMPLE_RATE):
    return grouped_audio_loader(audio_files(paths, audio_sample_rate),
                                batch_size)


def grouped_audioarray_loader(arrays, batch_size: int = 32):
    return grouped_audio_loader(arrays, batch_size)


# ------------------------------------------------------------ media loaders

def video_files(paths: Sequence[str],
                audio_sample_rate: int = DEFAULT_SAMPLE_RATE):
    """Decode whole media files to Clips (reference pig/data.py:117-136)."""
    from peppa_tpu.data.types import RawSegment

    for path in paths:
        duration = D.media_duration(path)
        yield D.decode_segment(
            RawSegment(path=path, video_start=0.0, video_end=duration,
                       audio_start=0.0, audio_end=duration),
            audio_sample_rate)


def videofile_loader(paths: Sequence[str], batch_size: int = 32,
                     audio_sample_rate: int = DEFAULT_SAMPLE_RATE):
    """Padded ClipBatches from whole media files."""
    from peppa_tpu.data.dataset import collate

    return _batched(video_files(paths, audio_sample_rate), batch_size,
                    collate)
