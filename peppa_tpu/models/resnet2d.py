"""Per-frame ResNet-18 image encoder (the "static" ablation), channels-last.

Capability parity: reference pig/models.py:156-200 (ImageEncoder): every frame
is embedded by a 2D ResNet-18 (ImageNet stats when pretrained), the per-frame
512-d embeddings are pooled over time (mean or attention), projected and L2
normalized.  The reference freezes `fc` (pig/models.py:164-166); our trunk
simply has no classification head.

TPU note: frames are folded into the batch axis ((B, T, H, W, C) ->
(B*T, H, W, C)) so the 2D convs see one large batch — the MXU-friendly way to
express "per-frame".  BatchNorm compute dtype and W8A8 quantization follow
the same knobs as the 3D tower (video3d.py): bn_dtype=None tracks the model
dtype (stats stay f32), `quant` runs the eval path through qlayers.QConv.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from peppa_tpu.models.layers import AttentionPool
from peppa_tpu.models.qlayers import QConv
from peppa_tpu.ops.similarity import l2_normalize


def _bn(dtype, name):
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype, name=name,
                        use_running_average=None)


class BasicBlock2D(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    bn_dtype: Optional[jnp.dtype] = None  # None: follow `dtype`
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        s = self.stride
        bnd = self.bn_dtype or self.dtype
        out = QConv(self.features, (3, 3), (s, s), [(1, 1), (1, 1)],
                    self.dtype, self.quant, name="conv1")(x)
        out = _bn(bnd, "bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = QConv(self.features, (3, 3), (1, 1), [(1, 1), (1, 1)],
                    self.dtype, self.quant, name="conv2")(out)
        out = _bn(bnd, "bn2")(out, use_running_average=not train)
        if s != 1 or x.shape[-1] != self.features:
            identity = QConv(self.features, (1, 1), (s, s), [(0, 0), (0, 0)],
                             self.dtype, self.quant, name="downsample")(x)
            identity = _bn(bnd, "bn_down")(identity,
                                           use_running_average=not train)
        return nn.relu(out + identity)


class ResNet18Trunk(nn.Module):
    """Standard ResNet-18 trunk up to global average pooling; (B, H, W, 3) -> (B, 512)."""
    dtype: jnp.dtype = jnp.float32
    bn_dtype: Optional[jnp.dtype] = None  # None: follow `dtype`
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = QConv(64, (7, 7), (2, 2), [(3, 3), (3, 3)], self.dtype,
                  self.quant, name="stem_conv")(x)
        x = _bn(self.bn_dtype or self.dtype, "stem_bn")(
            x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for li, (width, stride) in enumerate(
                zip((64, 128, 256, 512), (1, 2, 2, 2)), 1):
            for bi in range(2):
                x = BasicBlock2D(width, stride if bi == 0 else 1, self.dtype,
                                 self.bn_dtype, self.quant,
                                 name=f"layer{li}_block{bi}")(x, train)
        return jnp.mean(x, axis=(1, 2))  # global average pool


class ImageEncoder(nn.Module):
    """Static video branch: per-frame ResNet-18 -> temporal pool -> project -> L2.

    Parity: reference pig/models.py:156-200.  `mean`/`std` default to the
    ImageNet stats used when pretrained (pig/models.py:335-336).
    """
    pooling: str = "average"
    project: bool = True
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    dtype: jnp.dtype = jnp.float32
    bn_dtype: Optional[jnp.dtype] = None  # None: follow `dtype`
    quant: bool = False  # W8A8 int8 convs on the eval path

    @nn.compact
    def __call__(self, video: jnp.ndarray,
                 frame_lengths: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 tap: str = "embedding") -> jnp.ndarray:
        b, t, h, w, c = video.shape
        if video.dtype == jnp.uint8:
            video = video.astype(jnp.float32) / 255.0  # native-loader path
        mean = jnp.asarray(self.mean, dtype=video.dtype)
        std = jnp.asarray(self.std, dtype=video.dtype)
        x = (video - mean) / std
        x = x.reshape(b * t, h, w, c).astype(self.dtype)
        emb = ResNet18Trunk(self.dtype, self.bn_dtype,
                            self.quant and not train, name="trunk")(x, train)
        emb = emb.reshape(b, t, -1)
        if tap == "features":
            return emb
        if self.pooling == "attention":
            pooled = AttentionPool(128, name="pool")(emb, frame_lengths)
        elif self.pooling == "average":
            if frame_lengths is None:
                pooled = jnp.mean(emb, axis=1)
            else:
                mask = (jnp.arange(t)[None, :] < frame_lengths[:, None])
                mask = mask.astype(emb.dtype)[:, :, None]
                pooled = jnp.sum(emb * mask, axis=1) / jnp.maximum(
                    jnp.sum(mask, axis=1), 1.0)
        else:
            raise ValueError(f"Invalid pooling {self.pooling}")
        if tap == "pooled":
            return pooled
        out = nn.Dense(512, dtype=self.dtype, name="project")(pooled) \
            if self.project else pooled
        if tap == "projected":
            return out
        return l2_normalize(out.astype(jnp.float32), axis=1)
