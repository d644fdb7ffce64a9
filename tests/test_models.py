"""Shape/sanity tests for the encoders and the dual model (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peppa_tpu.config import Config, conditions
from peppa_tpu.data.types import ClipBatch, TripletBatch
from peppa_tpu.models.dual_encoder import PeppaPig, init_model
from peppa_tpu.models.video3d import midplanes
from peppa_tpu.models.wav2vec2 import CONV_LAYERS, Wav2Vec2Config, Wav2Vec2Encoder, conv_output_length


def tiny_config(**kw):
    cfg = Config()
    cfg.data.target_size = (32, 32)
    cfg.training.precision = "fp32"
    for k, v in kw.items():
        setattr(cfg.video, k, v) if hasattr(cfg.video, k) else None
    return cfg


TINY_W2V = Wav2Vec2Config(embed_dim=32, num_layers=2, num_heads=4, ffn_dim=64,
                          num_out=28, pos_conv_kernel=16, pos_conv_groups=4,
                          layer_drop=0.0)


def test_conv_output_length():
    # x320 downsample of the published conv stack
    s = 320
    for samples, in_1 in [(3200, None), (16000, None)]:
        frames = int(conv_output_length(jnp.asarray(samples)))
        assert frames == int(np.floor(
            _ref_conv_len(samples)))


def _ref_conv_len(samples):
    length = samples
    for _, k, stride in CONV_LAYERS:
        length = (length - k) // stride + 1
    return length


def test_wav2vec2_encoder_shapes_and_norm(rng):
    enc = Wav2Vec2Encoder(full=True, pooling="attention", project=True,
                          cfg=TINY_W2V)
    audio = jnp.asarray(rng.normal(size=(2, 3200)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), audio)
    out = enc.apply(variables, audio)
    assert out.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, rtol=1e-4)
    # taps
    conv = enc.apply(variables, audio, tap="conv")
    assert conv.shape[2] == 512
    ctx = enc.apply(variables, audio, tap="context")
    assert ctx.shape[2] == TINY_W2V.embed_dim
    logits = enc.apply(variables, audio, tap="logits")
    assert logits.shape[2] == 28


def test_wav2vec2_full_false_uses_conv_features(rng):
    enc = Wav2Vec2Encoder(full=False, pooling="average", project=True, cfg=TINY_W2V)
    audio = jnp.asarray(rng.normal(size=(1, 3200)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), audio)
    pooled = enc.apply(variables, audio, tap="pooled")
    assert pooled.shape == (1, 512)


def test_midplanes_matches_formula():
    # golden values from the (2+1)D paper formula
    assert midplanes(3, 64) == (3 * 64 * 27) // (3 * 9 + 3 * 64)
    assert midplanes(64, 64) == (64 * 64 * 27) // (64 * 9 + 3 * 64)
    assert midplanes(64, 128) == (64 * 128 * 27) // (64 * 9 + 3 * 128)


@pytest.mark.parametrize("version", ["r2plus1d_18", "r3d_18", "mc3_18"])
def test_video_encoder_shapes(rng, version):
    from peppa_tpu.models.video3d import R3DEncoder

    enc = R3DEncoder(version=version, pooling="attention")
    video = jnp.asarray(rng.uniform(size=(1, 4, 32, 32, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), video)
    out = enc.apply(variables, video)
    assert out.shape == (1, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, rtol=1e-4)


def test_image_encoder_shapes(rng):
    from peppa_tpu.models.resnet2d import ImageEncoder

    enc = ImageEncoder(pooling="average")
    video = jnp.asarray(rng.uniform(size=(1, 3, 32, 32, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), video)
    out = enc.apply(variables, video)
    assert out.shape == (1, 512)


def test_dual_encoder_forward_clip_and_triplet(rng):
    cfg = tiny_config()
    # shrink the audio trunk via monkeypatching is overkill: use the real
    # module but minuscule inputs
    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  audio_samples=3200, video_frames=4)
    batch = ClipBatch(
        video=jnp.asarray(rng.uniform(size=(2, 4, 32, 32, 3)).astype(np.float32)),
        audio=jnp.asarray(rng.normal(size=(2, 3200)).astype(np.float32)),
        video_duration=jnp.asarray([0.4, 0.4]),
        audio_duration=jnp.asarray([0.4, 0.4]),
        video_frames=jnp.asarray([4, 4], jnp.int32),
        audio_samples=jnp.asarray([3200, 3200], jnp.int32))
    out = model.apply(variables, batch)
    assert out.video.shape == (2, 512)
    assert out.audio.shape == (2, 512)

    trip = TripletBatch(anchor=batch.audio, positive=batch.video, negative=batch.video)
    tout = model.apply(variables, trip)
    assert tout.anchor.shape == (2, 512)
    # positive == negative here, so similarity diff must be ~0
    np.testing.assert_allclose(np.asarray(tout.positive), np.asarray(tout.negative))


def test_conditions_cover_reference_ablations():
    cfgs = conditions()
    assert set(cfgs) == {"base", "freeze_wav2vec", "jitter", "pretraining_v",
                         "pretraining_a", "pretraining_none", "static"}
    assert cfgs["freeze_wav2vec"].audio.freeze_encoder_layers == 12
    assert cfgs["static"].video.static
    assert not cfgs["pretraining_none"].audio.pretrained
    assert not cfgs["pretraining_none"].video.pretrained


def test_remat_matches_plain_forward(rng):
    """remat_video/remat_audio change memory, not numerics."""
    import copy

    from peppa_tpu.data.types import ClipBatch

    cfg = Config()
    cfg.data.target_size = (32, 32)
    cfg.training.precision = "fp32"
    cfg.audio.full = False
    cfg.video.version = "r3d_18"
    model, variables = init_model(cfg, jax.random.PRNGKey(0))

    cfg_r = copy.deepcopy(cfg)
    cfg_r.tpu.remat_audio = True
    cfg_r.tpu.remat_video = True
    model_r = PeppaPig(cfg_r)

    b, frames, samples = 2, 4, 3200
    batch = ClipBatch(
        video=jnp.asarray(rng.uniform(size=(b, frames, 32, 32, 3))
                          .astype(np.float32)),
        audio=jnp.asarray(rng.normal(size=(b, samples)).astype(np.float32)),
        video_duration=jnp.ones((b,)), audio_duration=jnp.ones((b,)),
        video_frames=jnp.full((b,), frames, jnp.int32),
        audio_samples=jnp.full((b,), samples, jnp.int32))
    out = model.apply(variables, batch, train=False)
    out_r = model_r.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(out_r.video),
                               np.asarray(out.video), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_r.audio),
                               np.asarray(out.audio), rtol=1e-5, atol=1e-5)

    # grads flow through the remat'd towers
    from peppa_tpu.ops.loss import triplet_loss

    def loss_fn(params):
        o = model_r.apply({"params": params,
                           "batch_stats": variables.get("batch_stats", {})},
                          batch, train=False)
        return triplet_loss(o.video, o.audio)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_midplanes_multiple_variant(rng):
    """MXU-aligned midplane widths: valid from-scratch AND with pretrained
    weights (the Kinetics import adapter convert.py::widen_midplanes maps the
    original mid widths onto the rounded ones, so the combination that round 1
    blocked is now the production configuration)."""
    from peppa_tpu.models.video3d import R3DEncoder, midplanes

    assert midplanes(64, 64) == 144
    assert midplanes(64, 64, 128) == 128
    assert midplanes(256, 256, 128) == 512  # 576 -> nearest 128 multiple

    enc = R3DEncoder(version="r2plus1d_18", pooling="average", project=False,
                     midplanes_multiple=128)
    video = jnp.asarray(rng.uniform(size=(1, 4, 16, 16, 3)).astype(np.float32))
    vs = enc.init(jax.random.PRNGKey(0), video)
    out = enc.apply(vs, video)
    assert out.shape == (1, 512)
    k = vs["params"]["trunk"]["layer1_block0"]["conv1"]["spatial"]["kernel"]
    assert k.shape[-1] == 128  # rounded from 144

    cfg = Config()
    cfg.video.midplanes_multiple = 128
    cfg.video.pretrained = True
    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  audio_samples=1600, video_frames=4)
    k = variables["params"]["video_encoder"]["trunk"][
        "layer1_block0"]["conv1"]["spatial"]["kernel"]
    assert k.shape[-1] == 128  # widened shape ready for the import adapter


def test_s2d_stem_conv_is_exact():
    rng = jax.random.PRNGKey(0)
    """Space-to-depth stem re-layout must equal the plain stride-2 conv.

    The parameter keeps the original (t,7,7,3,F) layout; the blocked form is
    a pure re-indexing, so outputs agree to f32 rounding (video3d.S2DStemConv).
    """
    from peppa_tpu.models.video3d import S2DStemConv

    for t, (h, w) in [(1, (12, 20)), (3, (10, 8))]:
        x = jax.random.normal(rng, (2, 5, h, w, 3), jnp.float32)
        on = S2DStemConv(16, t, jnp.float32, True)
        off = S2DStemConv(16, t, jnp.float32, False)
        params = on.init(rng, x)
        y1 = on.apply(params, x)
        y0 = off.apply(params, x)
        assert y1.shape == y0.shape == (2, 5, h // 2, w // 2, 16)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=0, atol=1e-5)


def test_s2d_stem_conv_odd_sizes_fall_back():
    rng = jax.random.PRNGKey(1)
    from peppa_tpu.models.video3d import S2DStemConv

    x = jax.random.normal(rng, (1, 3, 11, 13, 3), jnp.float32)
    mod = S2DStemConv(8, 1, jnp.float32, True)
    params = mod.init(rng, x)
    assert mod.apply(params, x).shape == (1, 3, 6, 7, 8)


@pytest.mark.parametrize("version", ["r2plus1d_18", "r3d_18", "mc3_18"])
def test_trunk_s2d_param_shapes_and_parity(version):
    rng = jax.random.PRNGKey(2)
    """stem_s2d must not change parameter shapes (checkpoints/importers) and
    must keep trunk outputs within f32 rounding of the plain path."""
    from peppa_tpu.models.video3d import VideoResNetTrunk

    x = jax.random.normal(rng, (1, 4, 20, 24, 3), jnp.float32)
    on = VideoResNetTrunk(version, stem_s2d=True)
    off = VideoResNetTrunk(version, stem_s2d=False)
    p_on = on.init(rng, x, False)
    p_off = off.init(rng, x, False)
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: a.shape == b.shape, p_on, p_off))
    y1 = np.asarray(on.apply(p_on, x, False))
    y0 = np.asarray(off.apply(p_on, x, False))
    scale = max(np.abs(y0).max(), 1.0)
    np.testing.assert_allclose(y1, y0, rtol=0, atol=5e-3 * scale)


def test_bn_dtype_follows_compute_dtype():
    rng = jax.random.PRNGKey(3)
    """bn_dtype=None follows the conv compute dtype (bf16 training keeps
    backward activations bf16); explicit float32 restores f32 round trips.
    Batch statistics are f32 either way (flax promotes reductions)."""
    from peppa_tpu.models.video3d import VideoResNetTrunk

    x = jax.random.normal(rng, (1, 4, 20, 24, 3), jnp.float32)
    auto = VideoResNetTrunk("r2plus1d_18", jnp.bfloat16)
    forced = VideoResNetTrunk("r2plus1d_18", jnp.bfloat16,
                              bn_dtype=jnp.float32)
    params = auto.init(rng, x, False)
    y_auto = auto.apply(params, x, False)
    y_forced = forced.apply(params, x, False)
    assert y_auto.dtype == jnp.bfloat16
    # identical params; difference is only normalization rounding
    np.testing.assert_allclose(
        np.asarray(y_auto, dtype=np.float32),
        np.asarray(y_forced, dtype=np.float32), rtol=0.1, atol=0.5)
