"""Real-media decode verification: actual .avi/.mp4 containers + real WAVs.

The reference decodes episode media with moviepy (pig/data.py:67-85,
pig/preprocess.py:25-57); our decode backends were previously validated on
synthetic .npz clips only.  These tests synthesize REAL container files
in-test (cv2's bundled encoders — MJPG/mpeg4, the reference's episode codec
family) with analytically known frame/sample content, then assert
frame-level and sample-level agreement between peppa_tpu.data.decode and
that ground truth (the quantity moviepy would read from the same file).
"""

import os
import wave as wave_mod

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from peppa_tpu.data import decode as D

FPS = 25
W, H = 64, 48
N_FRAMES = 40  # 1.6 s


def frame_value(i: int) -> int:
    """Per-frame gray level, spaced to survive lossy codecs (step 6)."""
    return 20 + 5 * i


def write_real_video(path: str, fourcc: str = "MJPG") -> None:
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), FPS, (W, H))
    assert w.isOpened(), f"cv2 cannot encode {fourcc}"
    for i in range(N_FRAMES):
        w.write(np.full((H, W, 3), frame_value(i), np.uint8))
    w.release()


@pytest.fixture(params=["MJPG", "mp4v"])
def video_path(tmp_path, request):
    ext = ".avi" if request.param == "MJPG" else ".mp4"
    path = str(tmp_path / f"episode{ext}")
    write_real_video(path, request.param)
    return path


def test_media_duration_real_container(video_path):
    assert D.media_duration(video_path) == pytest.approx(N_FRAMES / FPS,
                                                         abs=0.05)


def test_decode_video_frames_window_and_content(video_path):
    """Frames in [start, end) at the container's fps, values matching what
    was encoded (the moviepy-equivalent read of the same file)."""
    start, end = 0.4, 0.8
    frames = D.decode_video_frames(video_path, start, end)
    i0, i1 = int(round(start * FPS)), int(round(end * FPS))
    assert frames.shape == (i1 - i0, H, W, 3)
    assert frames.dtype == np.float32
    for k in range(i1 - i0):
        want = frame_value(i0 + k) / 255.0
        got = float(frames[k].mean())
        assert got == pytest.approx(want, abs=8 / 255.0), (k, got, want)


def test_decode_video_frames_resize(video_path):
    frames = D.decode_video_frames(video_path, 0.0, 0.2, target_size=(32, 20))
    assert frames.shape[1:] == (20, 32, 3)
    assert float(frames[0].mean()) == pytest.approx(frame_value(0) / 255.0,
                                                    abs=8 / 255.0)


def test_decode_video_full_range(video_path):
    frames = D.decode_video_frames(video_path, 0.0, N_FRAMES / FPS)
    assert frames.shape[0] == N_FRAMES


def write_real_wav(path: str, sr: int = 22050, seconds: float = 2.0,
                   channels: int = 2) -> np.ndarray:
    """Stereo int16 WAV with known content; returns the float samples."""
    n = int(sr * seconds)
    t = np.arange(n, dtype=np.float64)
    left = 0.5 * np.sin(2 * np.pi * 440.0 * t / sr)
    right = 0.25 * np.sin(2 * np.pi * 220.0 * t / sr)
    data = np.stack([left, right], axis=1) if channels == 2 else left[:, None]
    ints = np.clip(np.round(data * 32768.0), -32768, 32767).astype(np.int16)
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(ints.tobytes())
    return ints.astype(np.float32) / 32768.0


def test_decode_audio_real_wav_window_mono_resample(tmp_path):
    """Sample-exact window + channel mean + linear resample vs analytic
    golden (what moviepy's to_soundarray + mean would produce)."""
    sr, target_sr = 22050, 44100
    path = str(tmp_path / "audio.wav")
    stored = write_real_wav(path, sr=sr)
    start, end = 0.25, 1.75
    got = D.decode_audio(path, start, end, sample_rate=target_sr)

    mono = stored.mean(axis=1)
    window = mono[int(start * sr):int(end * sr)]
    n_out = int(round(window.size * target_sr / sr))
    want = np.interp(np.linspace(0.0, window.size - 1, n_out),
                     np.arange(window.size), window).astype(np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_decode_audio_same_rate_is_sample_exact(tmp_path):
    sr = 16000
    path = str(tmp_path / "audio16k.wav")
    stored = write_real_wav(path, sr=sr, seconds=1.0, channels=1)
    got = D.decode_audio(path, 0.25, 0.75, sample_rate=sr)
    want = stored[:, 0][int(0.25 * sr):int(0.75 * sr)]
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_real_video_through_cache_and_model_path(tmp_path, video_path):
    """End-to-end: real container -> decode -> uint8 clip -> npz interchange
    round trip (the extract/cache path's media contract)."""
    frames = D.decode_video_frames(video_path, 0.0, 0.8)
    audio_path = str(tmp_path / "a.wav")
    write_real_wav(audio_path, sr=44100, seconds=0.8)
    audio = D.decode_audio(audio_path, 0.0, 0.8, sample_rate=44100)
    npz = str(tmp_path / "clip.npz")
    D.save_clip_npz(npz, (frames * 255).astype(np.uint8), audio,
                    fps=FPS, sample_rate=44100)
    clip = D.load_clip_npz(npz)
    assert clip.video.shape == frames.shape
    np.testing.assert_allclose(clip.video, frames, atol=1 / 255.0)
    np.testing.assert_allclose(clip.audio, audio, atol=1e-6)
