"""Tests for the packed cache format + the native C++ batch loader."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from peppa_tpu.data.cache import PackReader, write_pack
from peppa_tpu.data.types import Clip


def make_clips(rng, n=7, h=24, w=32):
    clips = []
    for i in range(n):
        t = int(rng.integers(3, 9))
        s = int(rng.integers(800, 2000))
        clips.append(Clip(
            video=rng.uniform(size=(t, h, w, 3)).astype(np.float32),
            audio=rng.normal(size=(s,)).astype(np.float32),
            video_duration=t / 10.0, audio_duration=s / 800.0))
    return clips


def test_pack_roundtrip(tmp_path, rng):
    clips = make_clips(rng)
    path = str(tmp_path / "test.pack")
    n = write_pack(path, clips)
    assert n == len(clips)
    reader = PackReader(path)
    assert len(reader) == len(clips)
    for i, clip in enumerate(clips):
        got = reader[i]
        # PackReader ships uint8 straight through (device fuses /255)
        want_q = (np.clip(clip.video, 0, 1) * 255).astype(np.uint8)
        np.testing.assert_array_equal(got.video, want_q)
        np.testing.assert_array_equal(got.audio, clip.audio)
        assert got.video_duration == pytest.approx(clip.video_duration)
        assert got.audio_duration == pytest.approx(clip.audio_duration)


def test_native_pack_matches_python_reader(tmp_path, rng):
    from peppa_tpu.native import NativePack, native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")
    clips = make_clips(rng)
    path = str(tmp_path / "test.pack")
    write_pack(path, clips)
    pack = NativePack(path)
    reader = PackReader(path)
    assert len(pack) == len(clips)
    for i in range(len(clips)):
        video, audio, vd, ad = pack.item(i)
        np.testing.assert_array_equal(video, reader.raw_video(i))
        np.testing.assert_array_equal(audio, reader[i].audio)
        assert vd == pytest.approx(clips[i].video_duration)
    pack.close()


def test_native_pack_rejects_corrupt_files(tmp_path, rng):
    """ppk_open bounds-validates the whole pack up front: truncated or
    offset-corrupted files fail with a clean IOError, never a worker-thread
    SIGSEGV (peppa_loader.cpp ppk_open)."""
    from peppa_tpu.native import NativePack, native_available

    if not native_available():
        pytest.skip("native loader not built")
    import struct

    clips = make_clips(rng)
    path = str(tmp_path / "ok.pack")
    write_pack(path, clips)
    blob = open(path, "rb").read()

    # truncated mid-payload (interrupted write without the os.replace)
    trunc = str(tmp_path / "trunc.pack")
    open(trunc, "wb").write(blob[: len(blob) // 2])
    with pytest.raises(IOError):
        NativePack(trunc)

    # header claims more items than the file can hold
    overcount = str(tmp_path / "overcount.pack")
    open(overcount, "wb").write(
        struct.pack("<IIQ", *struct.unpack_from("<II", blob)[:2],
                    10 ** 6) + blob[16:])
    with pytest.raises(IOError):
        NativePack(overcount)

    # an index entry pointing past EOF
    bad_entry = bytearray(blob)
    entry = struct.Struct("<QIIIIQQff")
    vals = list(entry.unpack_from(bad_entry, 16))
    vals[0] = len(blob) + 4096  # video_off out of bounds
    entry.pack_into(bad_entry, 16, *vals)
    badpath = str(tmp_path / "bad_entry.pack")
    open(badpath, "wb").write(bytes(bad_entry))
    with pytest.raises(IOError):
        NativePack(badpath)

    # wrong magic
    badmagic = str(tmp_path / "magic.pack")
    open(badmagic, "wb").write(b"XXXX" + blob[4:])
    with pytest.raises(IOError):
        NativePack(badmagic)

    # dims whose uint64 product WRAPS to a small value: t=h=2^31 makes
    # t*h*w*c ≡ small (mod 2^64), sailing past a naive range check while the
    # assemble memcpy would still read far out of bounds — the validator's
    # per-factor limits must reject it
    overflow = bytearray(blob)
    vals = list(entry.unpack_from(overflow, 16))
    vals[1] = 2 ** 31  # t
    vals[2] = 2 ** 31  # h
    vals[3] = 2  # w
    vals[4] = 1  # c -> product = 2^63 * ... wraps
    entry.pack_into(overflow, 16, *vals)
    ovfpath = str(tmp_path / "overflow.pack")
    open(ovfpath, "wb").write(bytes(overflow))
    with pytest.raises(IOError):
        NativePack(ovfpath)

    # audio length wrapping abytes = s * 4
    aovf = bytearray(blob)
    vals = list(entry.unpack_from(aovf, 16))
    vals[6] = 2 ** 62  # s: abytes wraps to 0
    entry.pack_into(aovf, 16, *vals)
    aovfpath = str(tmp_path / "aovf.pack")
    open(aovfpath, "wb").write(bytes(aovf))
    with pytest.raises(IOError):
        NativePack(aovfpath)

    # the pristine file still opens
    assert len(NativePack(path)) == len(clips)


def test_native_batch_loader_padding_and_order(tmp_path, rng):
    from peppa_tpu.native import NativeBatchLoader, NativePack, native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")
    clips = make_clips(rng, n=10)
    path = str(tmp_path / "test.pack")
    write_pack(path, clips)
    pack = NativePack(path)

    pad_t, pad_s = 10, 2048
    plan = [([0, 3, 5], (pad_t, 24, 32, 3, pad_s)),
            ([1, 2], (pad_t, 24, 32, 3, pad_s)),
            ([9, 8, 7, 6], (pad_t, 24, 32, 3, pad_s))]
    loader = NativeBatchLoader(pack, plan, n_threads=3, depth=2)
    batches = list(loader)
    assert len(batches) == 3
    for (idx_list, _), batch in zip(plan, batches):
        assert batch.video.shape == (len(idx_list), pad_t, 24, 32, 3)
        assert batch.video.dtype == np.uint8
        assert batch.audio.shape == (len(idx_list), pad_s)
        for row, item_i in enumerate(idx_list):
            clip = clips[item_i]
            t = clip.video.shape[0]
            s = clip.audio.shape[0]
            want_v = (np.clip(clip.video, 0, 1) * 255).astype(np.uint8)
            np.testing.assert_array_equal(batch.video[row, :t], want_v)
            assert not batch.video[row, t:].any()  # zero padding
            np.testing.assert_array_equal(batch.audio[row, :s], clip.audio)
            assert not batch.audio[row, s:].any()
            assert batch.video_frames[row] == t
            assert batch.audio_samples[row] == s
            assert batch.video_duration[row] == pytest.approx(
                clip.video_duration)
    loader.close()
    pack.close()


def test_bucket_plan_matches_python_bucketing(tmp_path, rng):
    from peppa_tpu.native.loader import bucket_plan

    durations = np.asarray([[0.5, 0.5], [2.0, 2.2], [2.3, 2.3], [5.0, 5.1],
                            [2.3, 2.3], [0.4, 0.4]], np.float32)
    plan = bucket_plan(durations, buckets=(2.3, 6.0), batch_size=2,
                       target_hw=(32, 24), sample_rate=800, fps=10,
                       drop_last=False)
    # items 0,1,2,4,5 fit the 2.3 bucket; 3 fits the 6.0 bucket
    buckets_used = {p[1][0] for p in plan}
    assert buckets_used == {23, 60}
    all_items = sorted(i for p in plan for i in p[0])
    assert all_items == [0, 1, 2, 3, 4, 5]


def test_uint8_video_through_model(rng):
    """uint8 batches (native loader path) produce the same embeddings as float."""
    import jax
    import jax.numpy as jnp

    from peppa_tpu.models.video3d import R3DEncoder

    enc = R3DEncoder(version="r3d_18", pooling="average", project=False)
    vid_u8 = rng.integers(0, 256, size=(2, 4, 16, 16, 3), dtype=np.uint8)
    vs = enc.init(jax.random.PRNGKey(0), jnp.asarray(vid_u8))
    out_u8 = enc.apply(vs, jnp.asarray(vid_u8))
    out_f32 = enc.apply(vs, jnp.asarray(vid_u8.astype(np.float32) / 255.0))
    np.testing.assert_allclose(np.asarray(out_u8), np.asarray(out_f32),
                               rtol=1e-5, atol=1e-5)


def test_native_loader_stress_many_batches(tmp_path, rng):
    """Order + content integrity under thread contention (64 batches, 8 threads)."""
    from peppa_tpu.native import NativeBatchLoader, NativePack, native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")
    clips = make_clips(rng, n=16, h=8, w=8)
    path = str(tmp_path / "stress.pack")
    write_pack(path, clips)
    pack = NativePack(path)
    plan = []
    r = np.random.default_rng(1)
    for i in range(64):
        items = r.choice(16, size=3, replace=False).tolist()
        plan.append((items, (10, 8, 8, 3, 2048)))
    loader = NativeBatchLoader(pack, plan, n_threads=8, depth=3)
    for (idx_list, _), batch in zip(plan, loader):
        for row, item_i in enumerate(idx_list):
            clip = clips[item_i]
            s = clip.audio.shape[0]
            np.testing.assert_array_equal(batch.audio[row, :s], clip.audio)
            assert batch.audio_samples[row] == s
    loader.close()
    pack.close()


# ---------------------------------------------------------- pack v2 (int16)

def test_pack_v2_int16_roundtrip(tmp_path, rng):
    """v2 packs: int16 audio passes through exactly; float is grid-quantized."""
    from peppa_tpu.data.cache import AUDIO_I16_SCALE

    i16 = rng.integers(-32768, 32768, size=(1500,)).astype(np.int16)
    f32 = (rng.normal(size=(900,)) * 0.1).astype(np.float32)
    clips = [
        Clip(video=rng.uniform(size=(4, 24, 32, 3)).astype(np.float32),
             audio=i16, video_duration=0.4, audio_duration=1500 / 44100.0),
        Clip(video=rng.uniform(size=(3, 24, 32, 3)).astype(np.float32),
             audio=f32, video_duration=0.3, audio_duration=900 / 44100.0),
    ]
    path = str(tmp_path / "v2.pack")
    write_pack(path, clips, audio_int16=True)
    reader = PackReader(path)
    assert reader.version == 2 and reader.audio_dtype == np.int16
    # int16-origin media round-trips bit-exactly
    np.testing.assert_array_equal(reader[0].audio, i16)
    # float audio lands on the 1/32768 grid with correct rounding
    want = np.clip(np.round(f32.astype(np.float64) * AUDIO_I16_SCALE),
                   -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(reader[1].audio, want)
    np.testing.assert_allclose(want.astype(np.float64) / AUDIO_I16_SCALE,
                               f32, atol=0.5 / AUDIO_I16_SCALE + 1e-7)


def test_native_loader_v2_int16_batches(tmp_path, rng):
    """The C++ loader delivers int16 audio batches from v2 packs, zero-padded."""
    from peppa_tpu.native import NativeBatchLoader, NativePack, native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")
    clips = make_clips(rng, n=5)
    path = str(tmp_path / "v2.pack")
    write_pack(path, clips, audio_int16=True)
    pack = NativePack(path)
    assert pack.version == 2 and pack.audio_dtype == np.int16
    reader = PackReader(path)
    # per-item API
    for i in range(len(clips)):
        _, audio, _, _ = pack.item(i)
        assert audio.dtype == np.int16
        np.testing.assert_array_equal(audio, reader[i].audio)
    # batch API: pad beyond the longest item, assert content + zero padding
    pad_s = max(len(reader[i].audio) for i in range(len(clips))) + 17
    pad = (9, 24, 32, 3, pad_s)
    loader = NativeBatchLoader(pack, [([0, 1, 2], pad), ([3, 4], pad)],
                               n_threads=2, depth=2)
    batches = list(loader)
    assert [b.video.shape[0] for b in batches] == [3, 2]
    idx = 0
    for batch in batches:
        assert batch.audio.dtype == np.int16
        for row in range(batch.audio.shape[0]):
            want = reader[idx].audio
            np.testing.assert_array_equal(batch.audio[row, :len(want)], want)
            assert not batch.audio[row, len(want):].any()
            assert batch.audio_samples[row] == len(want)
            idx += 1
    loader.close()
    pack.close()


def test_int16_audio_through_encoder(rng):
    """int16 waveforms produce the same embeddings as float/32768 (device
    conversion in Wav2Vec2Encoder, mirroring the uint8-video path)."""
    import jax
    import jax.numpy as jnp

    from peppa_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    enc = Wav2Vec2Encoder(cfg=Wav2Vec2Config(num_layers=1), pooling="average",
                          project=False)
    a_i16 = rng.integers(-2000, 2000, size=(2, 3200)).astype(np.int16)
    a_f32 = a_i16.astype(np.float32) / 32768.0
    vs = enc.init(jax.random.PRNGKey(0), jnp.asarray(a_f32))
    out_i16 = enc.apply(vs, jnp.asarray(a_i16))
    out_f32 = enc.apply(vs, jnp.asarray(a_f32))
    np.testing.assert_array_equal(np.asarray(out_i16), np.asarray(out_f32))
