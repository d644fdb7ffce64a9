"""The dual audio/video encoder — the flagship model.

Capability parity: reference pig/models.py:223-325 (PeppaPig LightningModule):
holds the wav2vec2 audio branch and the 3D-CNN (or static per-frame) video
branch, dispatches ClipBatch vs TripletBatch forward, and exposes
encode_audio / encode_video with tap points.

This is a plain flax module — the training loop around it lives in
peppa_tpu/training (the Lightning-equivalent), keeping the model a pure
function of (params, batch) as XLA wants it.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from peppa_tpu.config import Config
from peppa_tpu.data.types import ClipBatch, TripletBatch
from peppa_tpu.models.normalization import resolve_stats
from peppa_tpu.models.resnet2d import ImageEncoder
from peppa_tpu.models.video3d import R3DEncoder
from peppa_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder


def _dtype_of(precision: str) -> jnp.dtype:
    return jnp.bfloat16 if precision in ("bf16", "16", "bfloat16") else jnp.float32


class PeppaPig(nn.Module):
    """Dual encoder; configure from a peppa_tpu.config.Config via `from_config`."""
    config: Config

    def setup(self):
        cfg = self.config
        dtype = _dtype_of(cfg.training.precision)
        audio_kw = {}
        if cfg.audio.num_layers is not None:
            audio_kw["num_layers"] = cfg.audio.num_layers
        if cfg.audio.dropout is not None:
            # one knob overrides every stochastic rate (config.py AudioConfig.
            # dropout): 0.0 gives a deterministic training forward for the
            # torch-vs-JAX dynamics twin
            audio_kw.update(dropout=cfg.audio.dropout,
                            attention_dropout=cfg.audio.dropout,
                            activation_dropout=cfg.audio.dropout,
                            layer_drop=cfg.audio.dropout)
        audio_cfg = Wav2Vec2Config(**audio_kw)
        # jax.checkpoint (remat) trades recompute for activation HBM on the
        # backward pass; argnums 3+ of the encoders' __call__ are static
        # (deterministic/train flags, tap names).
        audio_cls = (nn.remat(Wav2Vec2Encoder, static_argnums=(3, 4, 5))
                     if cfg.tpu.remat_audio else Wav2Vec2Encoder)
        video3d_cls = (nn.remat(R3DEncoder, static_argnums=(3, 4))
                       if cfg.tpu.remat_video else R3DEncoder)
        image_cls = (nn.remat(ImageEncoder, static_argnums=(3, 4))
                     if cfg.tpu.remat_video else ImageEncoder)
        # Pallas-under-TP guard: when the configured mesh shards the 'model'
        # axis, the q/k/v head dimension arrives sharded at the attention
        # kernel.  GSPMD partitions the custom call by replicate-and-gather —
        # CORRECT (proven by tests/test_pallas_kernels.py::test_mha_under_
        # model_sharded_mesh) but it all-gathers every head to every model
        # shard, defeating both TP and the kernel's no-HBM-round-trip point.
        # The XLA einsum path partitions natively over heads, so prefer it.
        tp_active = False
        if cfg.tpu.mesh_shape is not None:
            axes = list(cfg.tpu.mesh_axes)
            if "model" in axes:
                i = axes.index("model")
                shape = list(cfg.tpu.mesh_shape)
                tp_active = i < len(shape) and int(shape[i]) > 1
        self.audio_encoder = audio_cls(
            full=cfg.audio.full,
            pooling=cfg.audio.pooling,
            project=cfg.audio.project,
            cfg=audio_cfg,
            dtype=dtype,
            use_pallas=cfg.tpu.use_pallas and not tp_active,
            quant=cfg.tpu.quantize_int8,
            name="audio_encoder",
        )
        if cfg.video.static:
            norm = "imagenet" if cfg.video.pretrained else "peppa"
            mean, std = resolve_stats(norm, cfg.data.data_dir)
            self.video_encoder = image_cls(
                pooling=cfg.video.pooling,
                project=cfg.video.project,
                mean=tuple(mean), std=tuple(std),
                dtype=dtype,
                bn_dtype=(jnp.dtype(cfg.tpu.bn_dtype)
                          if cfg.tpu.bn_dtype else None),
                quant=cfg.tpu.quantize_int8,
                name="video_encoder",
            )
        else:
            # reference pig/models.py:140: kinetics stats if pretrained else peppa
            norm = "kinetics" if cfg.video.pretrained else "peppa"
            mean, std = resolve_stats(norm, cfg.data.data_dir)
            # midplanes_multiple widens the (2+1)D mid channels; pretrained
            # Kinetics weights are adapted exactly by zero-padding at import
            # (models/convert.py::widen_midplanes)
            self.video_encoder = video3d_cls(
                version=cfg.video.version,
                pooling=cfg.video.pooling,
                project=cfg.video.project,
                mean=tuple(mean), std=tuple(std),
                dtype=dtype,
                bn_dtype=(jnp.dtype(cfg.tpu.bn_dtype)
                          if cfg.tpu.bn_dtype else None),
                midplanes_multiple=cfg.video.midplanes_multiple,
                quant=cfg.tpu.quantize_int8,
                name="video_encoder",
            )

    def encode_video(self, video: jnp.ndarray,
                     frame_lengths: Optional[jnp.ndarray] = None,
                     train: bool = False, tap: str = "embedding") -> jnp.ndarray:
        """Embed (B, T, H, W, C) video to the shared 512-d space.

        Parity: reference pig/models.py:250-251.
        """
        # positional call: static_argnums of the remat'd class must see these
        return self.video_encoder(video, frame_lengths, train, tap)

    def encode_audio(self, audio: jnp.ndarray,
                     sample_lengths: Optional[jnp.ndarray] = None,
                     train: bool = False, tap: str = "embedding",
                     mask_padding: bool = False) -> jnp.ndarray:
        """Embed (B, S) waveforms to the shared 512-d space.

        Parity: reference pig/models.py:253-254.
        """
        # positional call: static_argnums of the remat'd class must see these
        return self.audio_encoder(audio, sample_lengths, not train, tap,
                                  mask_padding)

    def __call__(self, batch, train: bool = False):
        """Forward dispatch on batch type — reference pig/models.py:237-248."""
        if isinstance(batch, TripletBatch):
            a = self.encode_audio(batch.anchor, train=train)
            p = self.encode_video(batch.positive, train=train)
            n = self.encode_video(batch.negative, train=train)
            return TripletBatch(anchor=a, positive=p, negative=n)
        v = self.encode_video(batch.video, batch.video_frames, train=train)
        a = self.encode_audio(batch.audio, batch.audio_samples, train=train)
        return ClipBatch(video=v, audio=a,
                         video_duration=batch.video_duration,
                         audio_duration=batch.audio_duration,
                         video_frames=batch.video_frames,
                         audio_samples=batch.audio_samples)


def init_model(config: Config, rng: jax.Array,
               audio_samples: int = 16000, video_frames: int = 8,
               ) -> Tuple[PeppaPig, Dict[str, Any]]:
    """Build the module and initialize all variables with tiny dummy shapes.

    Param shapes are input-shape-independent (conv nets + shape-agnostic
    pooling), so init always runs on small inputs; the init itself is jitted —
    eager per-op dispatch over a tunneled TPU is catastrophically slow.

    Returns (module, variables) where variables contains 'params' and (for the
    video branch) 'batch_stats'.
    """
    model = PeppaPig(config)
    w, h = config.data.target_size
    # keep the init trace small; 32x32 frames and ~0.3 s audio are enough to
    # materialize every parameter
    h_i, w_i = min(h, 64), min(w, 64)
    frames_i = min(video_frames, 4)
    samples_i = min(audio_samples, 6400)
    video = jnp.zeros((1, frames_i, h_i, w_i, 3), jnp.float32)
    audio = jnp.zeros((1, samples_i), jnp.float32)
    batch = ClipBatch(video=video, audio=audio,
                      video_duration=jnp.ones((1,)), audio_duration=jnp.ones((1,)),
                      video_frames=jnp.full((1,), frames_i, jnp.int32),
                      audio_samples=jnp.full((1,), samples_i, jnp.int32))
    params_rng, dropout_rng, layerdrop_rng = jax.random.split(rng, 3)
    init_fn = jax.jit(model.init, static_argnames=("train",))
    variables = init_fn(
        {"params": params_rng, "dropout": dropout_rng, "layerdrop": layerdrop_rng},
        batch, train=False)
    return model, variables
