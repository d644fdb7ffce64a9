"""W8A8 dynamic-quantization primitives (ops/quant.py): correctness bounds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peppa_tpu.ops.quant import (absmax_weight_scale, act_scale, int8_conv,
                                 int8_matmul, quantize_int8)


def test_quantize_maps_zero_to_zero():
    x = jnp.asarray([[0.0, 0.5, -1.0], [0.0, 0.0, 0.0]])
    q = quantize_int8(x, act_scale(x))
    assert int(q[0, 0]) == 0
    assert np.all(np.asarray(q[1]) == 0)  # zero-padding rows stay exactly 0


def test_weight_scale_per_output_channel():
    w = jnp.stack([jnp.full((3, 4), 0.5), jnp.full((3, 4), 2.0)], axis=-1)
    s = absmax_weight_scale(w, -1)
    assert s.shape == (1, 1, 2)
    np.testing.assert_allclose(np.asarray(s).ravel(),
                               [0.5 / 127, 2.0 / 127], rtol=1e-6)


def test_int8_matmul_close_to_float():
    rng = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(rng)
    x = jax.random.normal(kx, (8, 64), jnp.float32)
    w = jax.random.normal(kw, (64, 32), jnp.float32) * 0.1
    y_ref = x @ w
    y_q = int8_matmul(x, w, out_dtype=jnp.float32)
    err = np.abs(np.asarray(y_q - y_ref))
    scale = np.abs(np.asarray(y_ref)).max()
    assert err.max() / scale < 0.02  # ~1/127 per-operand rounding


def test_int8_conv_close_to_float():
    rng = jax.random.PRNGKey(1)
    kx, kw = jax.random.split(rng)
    x = jax.random.normal(kx, (2, 5, 10, 12, 16), jnp.float32)
    w = jax.random.normal(kw, (1, 3, 3, 16, 24), jnp.float32) * 0.1
    dn = ("NDHWC", "DHWIO", "NDHWC")
    y_ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)], dimension_numbers=dn)
    y_q = int8_conv(x, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)], dn,
                    out_dtype=jnp.float32)
    assert y_q.shape == y_ref.shape
    err = np.abs(np.asarray(y_q - y_ref))
    scale = np.abs(np.asarray(y_ref)).max()
    assert err.max() / scale < 0.02


def test_int8_conv_zero_padding_rows_exact():
    """Zero-padded batch rows must produce exactly the all-zero-input output."""
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (1, 4, 6, 6, 8), jnp.float32)
    x = jnp.concatenate([x, jnp.zeros_like(x)], axis=0)
    w = jax.random.normal(rng, (1, 3, 3, 8, 8), jnp.float32)
    dn = ("NDHWC", "DHWIO", "NDHWC")
    y = int8_conv(x, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)], dn,
                  out_dtype=jnp.float32)
    assert np.all(np.asarray(y[1]) == 0.0)


def test_quant_flag_keeps_param_tree_identical():
    """quantize_int8 must not change the variable tree (checkpoint compat)."""
    from peppa_tpu.config import Config
    from peppa_tpu.models.dual_encoder import PeppaPig
    from peppa_tpu.data.types import ClipBatch

    def variables(q):
        cfg = Config()
        cfg.training.precision = "fp32"
        cfg.tpu.quantize_int8 = q
        cfg.audio.pretrained = cfg.video.pretrained = False
        model = PeppaPig(cfg)
        batch = ClipBatch(
            video=jnp.zeros((1, 3, 16, 16, 3), jnp.float32),
            audio=jnp.zeros((1, 3200), jnp.float32),
            video_duration=jnp.ones(1), audio_duration=jnp.ones(1),
            video_frames=jnp.full((1,), 3, jnp.int32),
            audio_samples=jnp.full((1,), 3200, jnp.int32))
        return model.init(jax.random.PRNGKey(0), batch, train=False)

    v0, v1 = variables(False), variables(True)
    p0 = jax.tree_util.tree_structure(v0)
    p1 = jax.tree_util.tree_structure(v1)
    assert p0 == p1
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: a.shape == b.shape, v0, v1))


def test_quant_embeddings_close_to_float():
    """int8 eval-path embeddings stay close to the float path (cosine > 0.99)
    and training-mode forward is NOT quantized (bitwise equal to float)."""
    from peppa_tpu.models.video3d import R3DEncoder
    from peppa_tpu.models.wav2vec2 import Wav2Vec2Encoder
    from tests.test_models import TINY_W2V

    rng = jax.random.PRNGKey(7)
    video = jax.random.uniform(rng, (2, 4, 16, 16, 3), jnp.float32)
    enc_f = R3DEncoder(version="r3d_18", quant=False)
    enc_q = R3DEncoder(version="r3d_18", quant=True)
    vs = enc_f.init(rng, video)
    e_f = np.asarray(enc_f.apply(vs, video))
    e_q = np.asarray(enc_q.apply(vs, video))
    cos = (e_f * e_q).sum(axis=1)  # both L2-normalized
    assert cos.min() > 0.99, cos

    audio = jax.random.normal(rng, (2, 6400), jnp.float32) * 0.1
    a_f = Wav2Vec2Encoder(cfg=TINY_W2V, quant=False, use_pallas=False)
    a_q = Wav2Vec2Encoder(cfg=TINY_W2V, quant=True, use_pallas=False)
    avs = a_f.init(rng, audio)
    ea_f = np.asarray(a_f.apply(avs, audio))
    ea_q = np.asarray(a_q.apply(avs, audio))
    cos_a = (ea_f * ea_q).sum(axis=1)
    assert cos_a.min() > 0.99, cos_a

    # train-mode forward ignores the quant flag (mutable batch stats for BN)
    t_f, _ = enc_f.apply(vs, video, None, True, mutable=["batch_stats"])
    t_q, _ = enc_q.apply(vs, video, None, True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_q))
