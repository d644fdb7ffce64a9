"""Shared pooling / attention modules for the encoders.

Capability parity: reference pig/models.py:30-61 (Attention, AveragePool,
LastStep) and pig/models.py:204-221 (VideoAveragePool, VideoAttention).

All poolers take an optional `lengths` array.  The reference pools over
whatever padding the per-batch pad-to-max collation produced
(pig/util.py:19-29) with no mask (pig/models.py:37-43); with fixed XLA bucket
shapes we pad further than the reference would, so `lengths` marks the
reference-visible extent: timesteps beyond it are excluded, reproducing the
reference numerics inside a static shape.  Pass `lengths=None` to pool over
the full padded length (the reference's exact behavior when shapes align).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def length_mask(lengths: jnp.ndarray, size: int) -> jnp.ndarray:
    """(B,) valid lengths -> (B, size) boolean mask."""
    pos = jnp.arange(size)[None, :]
    return pos < lengths[:, None]


class AttentionPool(nn.Module):
    """Per-feature soft attention over time.

    alpha = softmax_t(W_out tanh(W_h x)); out = sum_t alpha * x.
    Note the softmax is over the *time* axis independently per feature
    dimension (reference pig/models.py:37-43).
    """
    hidden_size: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = x.shape[-1]
        h = nn.Dense(self.hidden_size, name="hidden")(x)
        scores = nn.Dense(d, name="out")(jnp.tanh(h))  # (B, T, D)
        if lengths is not None:
            mask = length_mask(lengths, x.shape[1])[:, :, None]
            scores = jnp.where(mask, scores, -jnp.inf)
        alpha = nn.softmax(scores.astype(jnp.float32), axis=1).astype(x.dtype)
        return jnp.sum(alpha * x, axis=1)


class AveragePool(nn.Module):
    """Faithful port of the reference's AdaptiveAvgPool2d((size, 1)) pooler.

    The reference (pig/models.py:45-51) applies AdaptiveAvgPool2d((size, 1))
    to (B, T, D): the time axis is adaptively binned into `size` bins and the
    feature axis is averaged to one value — a quirk we reproduce exactly
    (with size == D this is an average over features per adaptive time bin).
    """
    size: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, t, d = x.shape
        del lengths  # the reference pools over padding; adaptive bins need static T
        feat_mean = jnp.mean(x, axis=2)  # (B, T)
        # adaptive 1d binning of T into self.size bins:
        # bin i spans [floor(i*T/size), ceil((i+1)*T/size))
        idx = jnp.arange(self.size)
        starts = jnp.floor(idx * t / self.size).astype(jnp.int32)
        ends = jnp.ceil((idx + 1) * t / self.size).astype(jnp.int32)
        pos = jnp.arange(t)
        sel = (pos[None, :] >= starts[:, None]) & (pos[None, :] < ends[:, None])  # (size, T)
        weights = sel.astype(x.dtype) / jnp.maximum(jnp.sum(sel, axis=1, keepdims=True), 1)
        return jnp.einsum("bt,st->bs", feat_mean, weights)


class LastStep(nn.Module):
    """Use the last timestep as the clip embedding (reference pig/models.py:54-61)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if lengths is None:
            return x[:, -1, :]
        idx = jnp.clip(lengths - 1, 0, x.shape[1] - 1)
        return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0, :]


class VideoAveragePool(nn.Module):
    """Global average over (T, H, W) — reference pig/models.py:204-211.

    Input layout here is channels-last (B, T, H, W, C).
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if lengths is None:
            return jnp.mean(x, axis=(1, 2, 3))
        mask = length_mask(lengths, x.shape[1]).astype(x.dtype)[:, :, None, None, None]
        total = jnp.sum(x * mask, axis=(1, 2, 3))
        count = jnp.sum(mask, axis=(1, 2, 3)) * x.shape[2] * x.shape[3]
        return total / jnp.maximum(count, 1.0)


class VideoAttentionPool(nn.Module):
    """Spatial average then temporal attention — reference pig/models.py:213-221."""
    hidden_size: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        pooled = jnp.mean(x, axis=(2, 3))  # (B, T, C)
        return AttentionPool(self.hidden_size, name="attn")(pooled, lengths)


def make_audio_pool(pooling: str, n_features: int) -> nn.Module:
    """Audio pooler factory — reference pig/models.py:88-95."""
    if pooling == "average":
        return AveragePool(size=n_features)
    if pooling == "attention":
        return AttentionPool(128)
    if pooling == "last":
        return LastStep()
    raise ValueError(f"Invalid pooling: {pooling}")


def make_video_pool(pooling: str) -> nn.Module:
    """Video pooler factory — reference pig/models.py:134-139."""
    if pooling == "attention":
        return VideoAttentionPool(128)
    if pooling == "average":
        return VideoAveragePool()
    raise ValueError(f"Invalid pooling {pooling}")
