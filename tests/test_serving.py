"""EncoderService: bucketed AOT serving path."""

import jax
import numpy as np
import pytest

from peppa_tpu.config import Config
from peppa_tpu.models.dual_encoder import init_model
from peppa_tpu.serving import EncoderService


@pytest.fixture(scope="module")
def service():
    cfg = Config()
    cfg.data.target_size = (32, 32)
    cfg.data.audio_sample_rate = 800
    cfg.training.precision = "fp32"
    cfg.audio.full = False
    cfg.video.version = "r3d_18"
    cfg.tpu.bucket_durations = (0.5, 1.0)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    return EncoderService(model, variables, cfg, batch_size=3)


def test_embed_audio_bucketing(service, rng):
    waves = [rng.normal(size=(s,)).astype(np.float32)
             for s in (200, 380, 400, 750, 123)]
    emb = service.embed_audio(waves)
    assert emb.shape == (5, 512)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4)
    # per-item results identical regardless of batch composition
    solo = service.embed_audio([waves[3]])
    np.testing.assert_allclose(solo[0], emb[3], atol=1e-5)


def test_embed_video_and_similarity(service, rng):
    clips = [rng.uniform(size=(t, 32, 32, 3)).astype(np.float32)
             for t in (3, 5, 9)]
    emb = service.embed_video(clips)
    assert emb.shape == (3, 512)
    waves = [rng.normal(size=(400,)).astype(np.float32) for _ in range(3)]
    a = service.embed_audio(waves)
    sim = service.similarity(emb, a)
    assert sim.shape == (3, 3)
    assert (np.abs(sim) <= 1.0 + 1e-5).all()


def test_overlong_items_clamp_to_last_bucket(service, rng):
    # 1.6 s at 800 Hz exceeds the 1.0 s last bucket -> cropped to it
    wave = rng.normal(size=(1280,)).astype(np.float32)
    emb = service.embed_audio([wave])
    assert emb.shape == (1, 512)
    ref = service.embed_audio([wave[:800]])
    np.testing.assert_allclose(emb, ref, atol=1e-6)


def test_warmup_compiles_all_buckets(service):
    service.warmup()  # compiles every (bucket, batch) program; must not raise


def test_video_dtype_canonicalized_to_uint8(service, rng):
    """Float and uint8 clips hit the SAME (uint8) compiled program: a mixed
    bucket must not truncate floats, and floats must not trigger a serving-
    time compile (warmup only builds the uint8 program)."""
    u8 = rng.integers(0, 256, size=(4, 32, 32, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    emb_u8 = service.embed_video([u8])
    emb_f32 = service.embed_video([f32])
    np.testing.assert_allclose(emb_u8, emb_f32, atol=1e-6)
    # mixed-dtype bucket: each row matches its solo embedding
    mixed = service.embed_video([f32, u8])
    np.testing.assert_allclose(mixed[0], emb_u8[0], atol=1e-5)
    np.testing.assert_allclose(mixed[1], emb_u8[0], atol=1e-5)


def test_serving_recycle_preserves_embeddings(service, rng):
    """A host-memory session recycle between chunks must not change results
    (utils/host_memory.py; on CPU the recycler is a plain host round trip)."""
    import jax as _jax

    waves = [rng.normal(size=(s,)).astype(np.float32) for s in (200, 400)]
    before = service.embed_audio(waves)

    class HostRoundTrip:
        available = True

        def recycle(self, tree):
            return _jax.device_put(_jax.device_get(tree))

    calls = []
    service._mem_watchdog.recycler = HostRoundTrip()
    service._mem_watchdog.limit_bytes = 1  # always over: recycle every chunk
    service._mem_watchdog.note_recycled = lambda: calls.append(1)
    try:
        after = service.embed_audio(waves)
    finally:
        service._mem_watchdog.limit_bytes = None
    assert calls
    np.testing.assert_array_equal(before, after)


def test_mesh_sharded_serving_matches_single_device(service, rng):
    """EncoderService over a data-sharded mesh: requests shard over the
    'data' axis, params replicate, embeddings match the 1-device service."""
    from peppa_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((8, 1), ("data", "model"))
    svc8 = EncoderService(service.model, service.variables, service.config,
                          batch_size=8, mesh=mesh)
    waves = [rng.normal(size=(s,)).astype(np.float32)
             for s in (200, 380, 400, 750, 123)]
    clips = [rng.uniform(size=(t, 32, 32, 3)).astype(np.float32)
             for t in (3, 5, 9)]
    np.testing.assert_allclose(
        svc8.embed_audio(waves), service.embed_audio(waves), atol=1e-5)
    np.testing.assert_allclose(
        svc8.embed_video(clips), service.embed_video(clips), atol=1e-5)
    with pytest.raises(ValueError, match="divide"):
        EncoderService(service.model, service.variables, service.config,
                       batch_size=3, mesh=mesh)
