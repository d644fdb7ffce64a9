"""3D-CNN video encoders: R(2+1)D-18, R3D-18, MC3-18 in Flax, channels-last.

Capability parity: reference pig/models.py:113-154 (R3DEncoder), which wraps
torchvision video resnets.  Architectures follow the published VideoResNet
family ("A Closer Look at Spatiotemporal Convolutions", Tran et al. 2018):

- r2plus1d_18: (2+1)D factorized convs — spatial (1,3,3) then temporal (3,1,1)
  with an intermediate width M = (t*d^2*C_in*C_out) / (d^2*C_in + t*C_out),
  stem = (1,7,7) s(1,2,2) -> 45ch -> (3,1,1) -> 64ch.
- r3d_18: full 3D (3,3,3) convs, stem (3,7,7) s(1,2,2).
- mc3_18: 3D convs in the stem + layer1, (1,3,3) convs in layers 2-4.

All use BasicBlocks [2,2,2,2], widths (64,128,256,512), strides (1,2,2,2),
BatchNorm + ReLU.  Layout is TPU-native channels-last (B, T, H, W, C) so XLA
tiles the convs onto the MXU; normalization stats are folded in up front
(reference pig/models.py:140, 327-342 build_transform).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from peppa_tpu.models.layers import make_video_pool
from peppa_tpu.models.qlayers import QConv
from peppa_tpu.ops.quant import int8_conv
from peppa_tpu.ops.similarity import l2_normalize


def _conv(x, features: int, kernel: Tuple[int, int, int],
          strides: Tuple[int, int, int], dtype, name: str,
          quant: bool = False):
    pad = [(k // 2, k // 2) for k in kernel]
    return QConv(features, kernel, strides, pad, dtype, quant, name=name)(x)


class S2DStemConv(nn.Module):
    """Stem conv (t,7,7) stride (1,2,2) over 3 channels, in space-to-depth form.

    The stem's MXU contraction dim is 7*7*3 = 147 (pads to 256: 57% lane use).
    Re-laying the input as 2x2 blocks (H/2, W/2, 12 channels) turns the
    stride-2 7-tap kernel into a stride-1 4-tap kernel with contraction
    4*4*12 = 192 (75% of 256) — measured 20% faster on v5e
    (scripts/perf_probe.py stem_s2d).  The parameter keeps the ORIGINAL
    (t,7,7,3,F) layout (checkpoints/importers unchanged); the exact
    re-layout below runs at apply time and is mathematically identity:
    output o[i] = sum_k w[k] x[2i+k-3] with x[2j+p] stored at block j phase p
    gives k = 2*dh + p - 1 for block-tap dh in 0..3 (k=-1 is a zero pad).
    Falls back to the plain conv when H or W is odd.
    """
    features: int
    t_kernel: int = 1
    dtype: jnp.dtype = jnp.float32
    enabled: bool = True
    quant: bool = False

    def _apply(self, x, w, strides, padding):
        dn = ("NDHWC", "DHWIO", "NDHWC")
        if self.quant:
            return int8_conv(x, w, strides, padding, dn,
                             out_dtype=self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=strides, padding=padding, dimension_numbers=dn)

    @nn.compact
    def __call__(self, x):
        t = self.t_kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (t, 7, 7, 3, self.features), jnp.float32)
        _, _, h, wd, _ = x.shape
        tp = t // 2
        if not self.enabled or h % 2 or wd % 2:
            return self._apply(x, w, (1, 2, 2),
                               [(tp, tp), (3, 3), (3, 3)])
        b, frames = x.shape[:2]
        # cast before the blocking transpose: it is HBM-bound, bf16 halves it
        xs = x.astype(self.dtype).reshape(b, frames, h // 2, 2, wd // 2, 2, 3)
        xs = xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            b, frames, h // 2, wd // 2, 12)
        # zero-pad 7 -> 8 taps in front, split into (block tap, phase):
        # ws[t, dh, ph, dw, pw] = w[t, 2*dh+ph-1, 2*dw+pw-1]
        ws = jnp.pad(w, [(0, 0), (1, 0), (1, 0), (0, 0), (0, 0)])
        ws = ws.reshape(t, 4, 2, 4, 2, 3, self.features)
        ws = ws.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
            t, 4, 4, 12, self.features)
        # block j ranges i-2..i+1 at the edges -> padding (2, 1)
        return self._apply(xs, ws, (1, 1, 1), [(tp, tp), (2, 1), (2, 1)])


class BatchNorm(nn.Module):
    """BatchNorm3d parity: eps 1e-5, running-stat momentum 0.1 (torch).

    `dtype` is the computation dtype for the normalization itself; batch
    statistics are ALWAYS accumulated in float32 (flax `_compute_stats`
    promotes).  The encoders default this to their conv compute dtype: in
    bf16 training that keeps the saved activations bf16 for the backward
    pass — measured -18 ms on the R(2+1)D trunk fwd+bwd at B=32 on v5e
    (194.4 -> 176.3 ms) with f32-identical statistics.  Pass
    bn_dtype=float32 on a bf16 model to restore f32 round trips.
    """
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        return nn.BatchNorm(use_running_average=use_running_average,
                            momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                            name="bn")(x)


def midplanes(c_in: int, c_out: int, multiple: Optional[int] = None) -> int:
    """R(2+1)D intermediate width (Tran et al. 2018, eq. for M_i).

    `multiple` rounds the width to the nearest multiple (>= multiple): the
    paper's widths (144/230/288/460/576/921...) waste MXU lanes (128-wide);
    rounding to 128 measures 23% faster on v5e with ~equal parameter count.
    Pretrained torchvision Kinetics checkpoints import into the widened
    shapes via the exact zero-pad adapter (convert.py::widen_midplanes), so
    this is the production config — see bench.py.
    """
    m = (c_in * c_out * 3 * 3 * 3) // (c_in * 3 * 3 + 3 * c_out)
    if multiple:
        m = max(round(m / multiple) * multiple, multiple)
    return m


class Conv2Plus1D(nn.Module):
    """(1,3,3) spatial conv -> BN -> ReLU -> (3,1,1) temporal conv.

    `mid_features`: torchvision computes midplanes once per block from the
    block's (in, out) and reuses it for conv2 — pass it in for weight parity.
    """
    features: int
    in_features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    mid_features: int = 0
    bn_dtype: Optional[jnp.dtype] = None  # None: follow `dtype`
    quant: bool = False

    @staticmethod
    def downsample_stride(s: int):
        return (s, s, s)

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.mid_features or midplanes(self.in_features, self.features)
        s = self.stride
        x = _conv(x, mid, (1, 3, 3), (1, s, s), self.dtype, "spatial",
                  quant=self.quant)
        x = BatchNorm(self.bn_dtype or self.dtype, name="bn_mid")(
            x, use_running_average=not train)
        x = nn.relu(x)
        x = _conv(x, self.features, (3, 1, 1), (s, 1, 1), self.dtype,
                  "temporal", quant=self.quant)
        return x


class Conv3DSimple(nn.Module):
    """Full (3,3,3) 3D conv."""
    features: int
    in_features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    mid_features: int = 0
    bn_dtype: Optional[jnp.dtype] = None  # None: follow `dtype`
    quant: bool = False

    @staticmethod
    def downsample_stride(s: int):
        return (s, s, s)

    @nn.compact
    def __call__(self, x, train: bool):
        s = self.stride
        return _conv(x, self.features, (3, 3, 3), (s, s, s), self.dtype,
                     "conv", quant=self.quant)


class Conv3DNoTemporal(nn.Module):
    """(1,3,3) spatial-only conv (MC3 layers 2-4)."""
    features: int
    in_features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    mid_features: int = 0
    bn_dtype: Optional[jnp.dtype] = None  # None: follow `dtype`
    quant: bool = False

    @staticmethod
    def downsample_stride(s: int):
        return (1, s, s)  # no temporal downsampling (torchvision parity)

    @nn.compact
    def __call__(self, x, train: bool):
        s = self.stride
        return _conv(x, self.features, (1, 3, 3), (1, s, s), self.dtype,
                     "conv", quant=self.quant)


CONV_MAKERS = {
    "r2plus1d_18": [Conv2Plus1D] * 4,
    "r3d_18": [Conv3DSimple] * 4,
    "mc3_18": [Conv3DSimple] + [Conv3DNoTemporal] * 3,
}


class BasicBlock(nn.Module):
    features: int
    in_features: int
    conv_maker: type
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    bn_dtype: Optional[jnp.dtype] = None  # None: follow `dtype`
    midplanes_multiple: Optional[int] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        bnd = self.bn_dtype or self.dtype
        # torchvision computes midplanes once per block (in -> out) and uses
        # it for both convs; reproduce for weight-shape parity.
        mid = midplanes(self.in_features, self.features,
                        self.midplanes_multiple)
        out = self.conv_maker(self.features, self.in_features, self.stride,
                              self.dtype, mid, bnd, self.quant,
                              name="conv1")(x, train)
        out = BatchNorm(bnd, name="bn1")(out,
                                         use_running_average=not train)
        out = nn.relu(out)
        out = self.conv_maker(self.features, self.features, 1,
                              self.dtype, mid, bnd, self.quant,
                              name="conv2")(out, train)
        out = BatchNorm(bnd, name="bn2")(out,
                                         use_running_average=not train)
        if self.stride != 1 or self.in_features != self.features:
            ds = self.conv_maker.downsample_stride(self.stride)
            identity = _conv(x, self.features, (1, 1, 1), ds,
                             self.dtype, "downsample", quant=self.quant)
            identity = BatchNorm(bnd, name="bn_down")(
                identity, use_running_average=not train)
        return nn.relu(out + identity)


class VideoResNetTrunk(nn.Module):
    """Stem + layers1-4 of the VideoResNet family; input (B, T, H, W, 3)."""
    version: str = "r2plus1d_18"
    dtype: jnp.dtype = jnp.float32
    bn_dtype: Optional[jnp.dtype] = None  # None: follow `dtype`
    midplanes_multiple: Optional[int] = None
    stem_s2d: bool = True
    quant: bool = False  # W8A8 int8 convs on the eval path (qlayers.QConv)

    @nn.compact
    def __call__(self, x, train: bool = False):
        makers = CONV_MAKERS[self.version]
        q = self.quant and not train  # inference-only quantization
        bn = lambda name: BatchNorm(self.bn_dtype or self.dtype, name=name)
        if self.version == "r2plus1d_18":
            x = S2DStemConv(45, 1, self.dtype, self.stem_s2d, q,
                            name="stem_spatial")(x)
            x = bn("stem_bn1")(x, use_running_average=not train)
            x = nn.relu(x)
            x = _conv(x, 64, (3, 1, 1), (1, 1, 1), self.dtype,
                      "stem_temporal", quant=q)
            x = bn("stem_bn2")(x, use_running_average=not train)
            x = nn.relu(x)
        else:
            x = S2DStemConv(64, 3, self.dtype, self.stem_s2d, q,
                            name="stem")(x)
            x = bn("stem_bn")(x, use_running_average=not train)
            x = nn.relu(x)

        widths = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        in_features = 64
        for li, (width, stride, maker) in enumerate(zip(widths, strides, makers), 1):
            for bi in range(2):
                x = BasicBlock(width, in_features, maker,
                               stride if bi == 0 else 1, self.dtype,
                               self.bn_dtype, self.midplanes_multiple, q,
                               name=f"layer{li}_block{bi}")(x, train)
                in_features = width
        return x  # (B, T', H', W', 512)


class R3DEncoder(nn.Module):
    """Video branch: normalize -> trunk -> pool -> project -> L2 norm.

    Parity: reference pig/models.py:113-154 (R3DEncoder.encode).  `mean`/`std`
    are the channel normalization stats (peppa or kinetics,
    pig/models.py:327-342); inputs are float video in [0, 1], channels-last.
    """
    version: str = "r2plus1d_18"
    pooling: str = "attention"
    project: bool = True
    mean: Tuple[float, float, float] = (0.43216, 0.394666, 0.37645)
    std: Tuple[float, float, float] = (0.22803, 0.22145, 0.216989)
    dtype: jnp.dtype = jnp.float32
    bn_dtype: Optional[jnp.dtype] = None  # None: follow `dtype`
    midplanes_multiple: Optional[int] = None
    stem_s2d: bool = True
    quant: bool = False  # W8A8 int8 convs on the eval path

    @nn.compact
    def __call__(self, video: jnp.ndarray,
                 frame_lengths: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 tap: str = "embedding") -> jnp.ndarray:
        if video.dtype == jnp.uint8:
            # native-loader path: uint8 ships to the device (4x less traffic),
            # /255 fuses into the normalization here
            video = video.astype(jnp.float32) / 255.0
        mean = jnp.asarray(self.mean, dtype=video.dtype)
        std = jnp.asarray(self.std, dtype=video.dtype)
        x = (video - mean) / std
        x = VideoResNetTrunk(self.version, self.dtype, self.bn_dtype,
                             self.midplanes_multiple, self.stem_s2d,
                             self.quant,
                             name="trunk")(x.astype(self.dtype), train)
        if tap == "features":
            return x
        # frame lengths survive the trunk's temporal stride (T/8 for layers 2-4)
        feat_lengths = None
        if frame_lengths is not None:
            t_stride = 8 if self.version != "mc3_18" else 1
            feat_lengths = jnp.maximum((frame_lengths + t_stride - 1) // t_stride, 1)
        pooled = make_video_pool(self.pooling)(x, feat_lengths)
        if tap == "pooled":
            return pooled
        out = nn.Dense(512, dtype=self.dtype, name="project")(pooled) \
            if self.project else pooled
        if tap == "projected":
            return out
        return l2_normalize(out.astype(jnp.float32), axis=1)
