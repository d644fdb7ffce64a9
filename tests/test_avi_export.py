"""Reference-consumable .avi clip export (data/avi.py + extract container).

Round-3 VERDICT missing #4: the reference's extraction writes mpeg4 .avi
clips its whole stack consumes (pig/preprocess.py:45-55); this repo's
extractor can now write the same container (cv2 mpeg4 video + in-process
PCM16 mux — no ffmpeg in this image).  Round trip: cv2 must read the video
stream back, read_avi_audio the PCM, and decode.decode_audio must route
.avi to the PCM parser when ffmpeg is absent.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

cv2 = pytest.importorskip("cv2")

from peppa_tpu.data.avi import mux_pcm_audio, parse_avi, read_avi_audio, \
    write_clip_avi


@pytest.fixture
def clip(tmp_path):
    rng = np.random.default_rng(0)
    t, h, w = 12, 48, 64
    video = rng.integers(0, 256, (t, h, w, 3), dtype=np.uint8)
    rate = 16000
    audio = (0.3 * np.sin(2 * np.pi * 440 / rate
                          * np.arange(int(t / 10 * rate)))).astype(np.float32)
    path = str(tmp_path / "clip.avi")
    write_clip_avi(path, video, audio, fps=10, rate=rate)
    return path, video, audio, rate


def test_video_stream_reads_back(clip):
    path, video, _, _ = clip
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
    cap.release()
    assert len(frames) == video.shape[0]
    assert frames[0].shape == (video.shape[1], video.shape[2], 3)
    # mpeg4 is lossy: compare means, not pixels
    got = np.stack(frames)[..., ::-1].astype(np.float32)
    assert abs(got.mean() - video.mean()) < 16


def test_audio_roundtrip_exact(clip):
    path, _, audio, rate = clip
    got, got_rate = read_avi_audio(path)
    assert got_rate == rate
    assert got.shape == audio.shape
    np.testing.assert_allclose(got, audio, atol=1.0 / 32000)


def test_decode_audio_routes_avi(clip, monkeypatch):
    from peppa_tpu.data import decode as D

    monkeypatch.setattr(D, "have_ffmpeg", lambda: False)
    path, _, audio, rate = clip
    a = D.decode_audio(path, 0.0, 0.5, sample_rate=rate)
    np.testing.assert_allclose(a, audio[:rate // 2], atol=1.0 / 32000)


def test_two_streams_declared(clip):
    path, video, _, _ = clip
    with open(path, "rb") as f:
        buf = f.read()
    avih, strls, frames = parse_avi(buf)
    import struct

    assert struct.unpack("<I", avih[24:28])[0] == 2  # dwStreams
    assert len(strls) == 2
    kinds = [f for f, _ in frames]
    assert kinds.count(b"00dc") == video.shape[0]
    assert b"01wb" in kinds


def test_mux_rejects_multistream(clip):
    path, _, audio, rate = clip
    with open(path, "rb") as f:
        two_stream = f.read()
    with pytest.raises(ValueError):
        mux_pcm_audio(two_stream, audio, rate)
