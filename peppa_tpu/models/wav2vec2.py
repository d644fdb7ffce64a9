"""wav2vec2-base audio encoder in Flax, with the reference's tap points.

Capability parity: reference pig/models.py:66-109 (Wav2VecEncoder), which wraps
torchaudio's wav2vec2 graph imported from the fairseq `wav2vec_small.pt`
checkpoint.  Architecture (wav2vec2-base):

- conv feature extractor: 7 conv1d layers, channels 512, no bias,
  (k, s) = (10,5) (3,2)x4 (2,2)x2 — x320 downsample; first layer followed by
  GroupNorm(512 groups == per-channel instance norm); exact (erf) GELU.
- feature projection: LayerNorm(512) -> Dense(768) -> dropout.
- convolutional positional embedding: depthwise-ish conv (kernel 128,
  groups 16) with weight-norm parameterization (norm over (out, in) per
  kernel position, fairseq dim=2), trailing element removed (even kernel),
  GELU; residual add; LayerNorm; dropout (post-norm variant).
- 12 post-norm transformer layers: MHA(768, 12 heads) and FFN(3072), GELU,
  residual + LayerNorm after each sublayer; layer-drop during training.
- aux head: Dense(768 -> 28) (the reference imports with num_out=28,
  pig/models.py:72-74, and uses those 28-d logits as features when
  `full=True`, pig/models.py:82-84, 101-103).

Taps (for parity with pig/grsa.py:437-474 Embedder stages):
- 'conv'    : conv extractor features, 512-d (reference `extract_features`,
              pig/models.py:85-86, 105)
- 'context' : transformer output, 768-d
- 'logits'  : aux head output, 28-d (reference `full=True` features)

Masking: `sample_lengths` marks valid audio samples; conv feature lengths are
derived with the conv arithmetic and padding frames can be excluded from
attention/pooling.  The reference runs unmasked over per-batch padding — pass
`lengths=None` behavior via `mask_padding=False` (default) to reproduce it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from peppa_tpu.models.layers import length_mask
from peppa_tpu.models.qlayers import QConv, QDense

# (out_channels, kernel, stride) per conv layer of the feature extractor
CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 2, 2),
    (512, 2, 2),
)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch nn.GELU default, not the tanh approximation.

    bf16 inputs take the bf16-exact polynomial path (ops/gelu.py: verified
    bit-identical for 99.5% of the whole bf16 domain, |delta| <= 4.8e-4 on
    the rest) — erf is transcendental-bound on the VPU and this model
    applies GELU to ~660M activations per batch.
    """
    from peppa_tpu.ops.gelu import gelu as _gelu

    return _gelu(x)


def conv_output_length(samples: jnp.ndarray) -> jnp.ndarray:
    """Number of conv feature frames for a given number of audio samples."""
    length = samples
    for _, k, s in CONV_LAYERS:
        length = (length - k) // s + 1
    return length


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    num_out: int = 28
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    layer_drop: float = 0.05
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16


class ConvFeatureExtractor(nn.Module):
    """7-layer strided conv front end, x320 downsample, bf16-friendly."""
    dtype: jnp.dtype = jnp.float32
    quant: bool = False  # W8A8 on conv1-6; conv0 reads raw audio, stays float

    @nn.compact
    def __call__(self, waveform: jnp.ndarray) -> jnp.ndarray:
        x = waveform[..., None].astype(self.dtype)  # (B, S, 1)
        for i, (ch, k, s) in enumerate(CONV_LAYERS):
            x = QConv(ch, (k,), (s,), "VALID", self.dtype,
                      quant=self.quant and i > 0, name=f"conv{i}")(x)
            if i == 0:
                # GroupNorm with groups == channels: per-channel norm over time
                x = nn.GroupNorm(num_groups=ch, epsilon=1e-5, dtype=jnp.float32,
                                 name="group_norm")(x)
            x = gelu(x)
        return x  # (B, T, 512)


class ConvPositionalEmbedding(nn.Module):
    """Grouped conv positional embedding with fairseq's weight-norm split."""
    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.cfg.embed_dim
        k = self.cfg.pos_conv_kernel
        g = self.cfg.pos_conv_groups
        # weight-norm parameterization: kernel = g_scale * v / ||v||,
        # norm over (in, out) per kernel position (fairseq weight_norm dim=2;
        # flax kernel layout is (k, in // groups, out) so that's axes (1, 2)).
        v = self.param("pos_conv_v", nn.initializers.normal(
            stddev=(4.0 / (k * d)) ** 0.5), (k, d // g, d))
        g_scale = self.param("pos_conv_g", nn.initializers.ones, (k, 1, 1))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2), keepdims=True) + 1e-12)
        kernel = (g_scale * v / norm).astype(self.dtype)
        bias = self.param("pos_conv_bias", nn.initializers.zeros, (d,))
        pad = k // 2
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel,
            window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=g,
        ) + bias.astype(self.dtype)
        if k % 2 == 0:
            out = out[:, :-1, :]  # even kernel: drop trailing element
        return gelu(out)


class SelfAttention(nn.Module):
    """Multi-head self-attention.

    With `use_pallas` and a TPU backend, the score/softmax/PV chain runs as
    the fused full-block Pallas kernel (ops/pallas/attention.py) — no
    (B, H, T, T) round trip through HBM.  Attention dropout (training) uses
    the XLA path, whose probability tensor the dropout mask needs anyway.
    """
    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray],
                 deterministic: bool) -> jnp.ndarray:
        from peppa_tpu.ops.pallas.attention import MAX_T_PAD, mha_attention
        from peppa_tpu.ops.pallas.common import use_pallas as pallas_ok

        d = self.cfg.embed_dim
        h = self.cfg.num_heads
        hd = d // h
        qkv_dense = lambda name: QDense(d, self.dtype, self.quant, name=name)
        q = qkv_dense("q_proj")(x).reshape(*x.shape[:2], h, hd)
        k = qkv_dense("k_proj")(x).reshape(*x.shape[:2], h, hd)
        v = qkv_dense("v_proj")(x).reshape(*x.shape[:2], h, hd)
        scale = hd ** -0.5
        attn_dropout = self.cfg.attention_dropout > 0 and not deterministic
        if (self.use_pallas and pallas_ok() and not attn_dropout
                and x.shape[1] <= MAX_T_PAD):
            out = mha_attention(q, k, v, lengths=lengths, scale=scale)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                                preferred_element_type=jnp.float32)
            if lengths is not None:
                # keys at padding get -inf
                mask = length_mask(lengths, x.shape[1])
                logits = jnp.where(mask[:, None, None, :], logits, -jnp.inf)
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            if attn_dropout:
                probs = nn.Dropout(self.cfg.attention_dropout)(
                    probs, deterministic=False)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(*x.shape[:2], d)
        return QDense(d, self.dtype, self.quant, name="out_proj")(out)


class TransformerLayer(nn.Module):
    """Post-norm transformer layer (wav2vec2-base: layer_norm_first=False)."""
    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray],
                 deterministic: bool) -> jnp.ndarray:
        attn = SelfAttention(self.cfg, self.dtype, self.use_pallas, self.quant,
                             name="attention")(x, lengths, deterministic)
        attn = nn.Dropout(self.cfg.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x + attn)

        y = QDense(self.cfg.ffn_dim, self.dtype, self.quant, name="ffn_in")(x)
        y = gelu(y)
        y = nn.Dropout(self.cfg.activation_dropout)(y, deterministic=deterministic)
        y = QDense(self.cfg.embed_dim, self.dtype, self.quant, name="ffn_out")(y)
        y = nn.Dropout(self.cfg.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x + y)


class Wav2Vec2(nn.Module):
    """The wav2vec2-base trunk with tap points."""
    cfg: Wav2Vec2Config = Wav2Vec2Config()
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True
    quant: bool = False  # W8A8 convs/denses on the eval (deterministic) path

    @nn.compact
    def __call__(self, waveform: jnp.ndarray,
                 sample_lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 tap: str = "logits",
                 mask_padding: bool = False):
        """waveform: (B, S) mono audio. Returns features at `tap` and frame lengths."""
        q = self.quant and deterministic  # inference-only quantization
        feats = ConvFeatureExtractor(self.dtype, q,
                                     name="feature_extractor")(waveform)
        frame_lengths = (conv_output_length(sample_lengths)
                         if sample_lengths is not None else None)
        if tap == "conv":
            return feats, frame_lengths

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="proj_ln")(feats)
        x = QDense(self.cfg.embed_dim, self.dtype, q, name="proj")(x)
        x = nn.Dropout(self.cfg.dropout)(x, deterministic=deterministic)

        x = x + ConvPositionalEmbedding(self.cfg, self.dtype, name="pos_conv")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="encoder_ln")(x)
        x = nn.Dropout(self.cfg.dropout)(x, deterministic=deterministic)

        attn_lengths = frame_lengths if (mask_padding and
                                         frame_lengths is not None) else None

        for i in range(self.cfg.num_layers):
            layer = TransformerLayer(self.cfg, self.dtype, self.use_pallas, q,
                                     name=f"layer{i}")
            if not deterministic and self.cfg.layer_drop > 0:
                keep = jax.random.bernoulli(
                    self.make_rng("layerdrop"), 1.0 - self.cfg.layer_drop)
                y = layer(x, attn_lengths, deterministic)
                x = jnp.where(keep, y, x)
            else:
                x = layer(x, attn_lengths, deterministic)
        if tap == "context":
            return x, frame_lengths

        logits = nn.Dense(self.cfg.num_out, dtype=self.dtype, name="aux")(x)
        if tap == "logits":
            return logits, frame_lengths
        raise ValueError(f"Unknown tap {tap!r}")


class Wav2Vec2Encoder(nn.Module):
    """Full audio branch: wav2vec2 trunk -> pooling -> projection -> L2 norm.

    Parity: reference pig/models.py:66-109 (Wav2VecEncoder).  `full=True`
    pools the 28-d aux logits; `full=False` pools the 512-d conv features.
    Freezing (reference pig/models.py:75-81) is handled by the optimizer
    mask (peppa_tpu/training/optimization.py), not the module.
    """
    full: bool = True
    pooling: str = "attention"
    project: bool = True
    cfg: Wav2Vec2Config = Wav2Vec2Config()
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True
    quant: bool = False  # W8A8 on the eval path (see qlayers)

    @nn.compact
    def __call__(self, waveform: jnp.ndarray,
                 sample_lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 tap: str = "embedding",
                 mask_padding: bool = False) -> jnp.ndarray:
        from peppa_tpu.models.layers import make_audio_pool
        from peppa_tpu.ops.similarity import l2_normalize

        if waveform.ndim == 3:  # (B, 1, S) channel layout from collation
            waveform = waveform[:, 0, :]
        if waveform.dtype == jnp.int16:
            # native-loader v2 path: int16 ships to the device (2x less
            # traffic); the /32768 wav scaling fuses here, mirroring the
            # uint8-video path (video3d.py) and the 16-bit-wav -> float
            # conversion the decode path applies (data/decode.py)
            waveform = waveform.astype(jnp.float32) * (1.0 / 32768.0)
        trunk_tap = "logits" if self.full else "conv"
        if tap in ("conv", "context", "logits"):
            trunk_tap = tap
        feats, frame_lengths = Wav2Vec2(self.cfg, self.dtype, self.use_pallas,
                                        self.quant, name="wav2vec2")(
            waveform, sample_lengths, deterministic, trunk_tap, mask_padding)
        if tap in ("conv", "context", "logits"):
            return feats

        n_features = self.cfg.num_out if self.full else 512
        pool = make_audio_pool(self.pooling, n_features)
        pooled = pool(feats, frame_lengths if mask_padding else None)
        if tap == "pooled":
            return pooled
        if self.project:
            out = nn.Dense(512, dtype=self.dtype, name="project")(pooled)
        else:
            out = pooled
        if tap == "projected":
            return out
        return l2_normalize(out.astype(jnp.float32), axis=1)
