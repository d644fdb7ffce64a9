"""Host-side decode tests: wav reading, linear resampling, npz clips."""

import wave

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from peppa_tpu.data import decode as D


def write_wav(path, samples, sr=8000, ch=1):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sr)
        data = (np.clip(samples, -1, 1) * 32767).astype("<i2")
        w.writeframes(data.tobytes())


def test_read_wav_mono_slice(tmp_path, rng):
    sr = 8000
    samples = rng.uniform(-0.5, 0.5, size=(sr * 2,)).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(path, samples, sr)
    got = D._read_wav(str(path), 0.5, 1.5, sr)
    assert got.shape == (sr,)
    np.testing.assert_allclose(got, samples[sr // 2:sr + sr // 2], atol=1e-3)


def test_read_wav_stereo_downmix(tmp_path, rng):
    sr = 4000
    left = rng.uniform(-0.5, 0.5, size=(sr,)).astype(np.float32)
    right = rng.uniform(-0.5, 0.5, size=(sr,)).astype(np.float32)
    inter = np.stack([left, right], axis=1).reshape(-1)
    path = tmp_path / "st.wav"
    write_wav(path, inter, sr, ch=2)
    got = D._read_wav(str(path), 0.0, 1.0, sr)
    np.testing.assert_allclose(got, (left + right) / 2, atol=2e-3)


def test_read_wav_resamples(tmp_path):
    sr = 8000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = 0.5 * np.sin(2 * np.pi * 100 * t)
    path = tmp_path / "tone.wav"
    write_wav(path, tone, sr)
    got = D._read_wav(str(path), 0.0, 1.0, 16000)
    assert abs(got.shape[0] - 16000) <= 2
    # the tone survives resampling
    spec = np.abs(np.fft.rfft(got))
    assert abs(np.argmax(spec) - 100) <= 2


def test_resample_linear_identity_and_ratio(rng):
    x = rng.normal(size=(1000,)).astype(np.float32)
    assert D.resample_linear(x, 100, 100) is x
    y = D.resample_linear(x, 100, 50)
    assert y.shape == (500,)
    z = D.resample_linear(np.zeros((0,), np.float32), 100, 50)
    assert z.shape == (0,)


def test_npz_clip_roundtrip(tmp_path, rng):
    video = (rng.uniform(size=(12, 8, 10, 3)) * 255).astype(np.uint8)
    audio = rng.normal(size=(1200,)).astype(np.float32)
    path = str(tmp_path / "clip.npz")
    D.save_clip_npz(path, video, audio, fps=10, sample_rate=600)
    assert D.media_duration(path) == pytest.approx(1.2)
    frames = D.decode_video_frames(path, 0.2, 0.7)
    np.testing.assert_allclose(frames, video[2:7].astype(np.float32) / 255.0)
    a = D.decode_audio(path, 0.5, 1.0, 600)
    np.testing.assert_array_equal(a, audio[300:600])
    # resampling path on npz audio
    a2 = D.decode_audio(path, 0.0, 1.0, 300)
    assert a2.shape[0] == 300
    clip = D.load_clip_npz(path)
    assert clip.video_duration == pytest.approx(1.2)
    assert clip.audio_duration == pytest.approx(2.0)
