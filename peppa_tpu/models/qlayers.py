"""Quantization-aware Conv/Dense flax modules.

Drop-in replacements for nn.Conv(use_bias=False)/nn.Dense with an IDENTICAL
parameter tree (param "kernel"/"bias", same shapes/initializers), so existing
checkpoints and the torch importers (models/convert.py) work unchanged.  With
`quant=True` they run the W8A8 dynamic-quantization path (ops/quant.py) —
int8 MXU issue rate is ~6.5x bf16 on v5e (scripts/perf_probe.py peak) — and
with `quant=False` they reproduce nn.Conv/nn.Dense float numerics exactly.

The quant flag is an inference-path feature: callers gate it on eval mode
(see video3d.VideoResNetTrunk / wav2vec2.Wav2Vec2); training always runs the
float path so optimization is untouched.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from peppa_tpu.ops.quant import int8_conv, int8_matmul

_DIM_NUMBERS = {
    1: ("NWC", "WIO", "NWC"),
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


class QConv(nn.Module):
    """nn.Conv(use_bias=False) twin with an optional int8 path."""
    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Union[str, Sequence[Tuple[int, int]]]
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        rank = len(self.kernel_size)
        dn = _DIM_NUMBERS[rank]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*self.kernel_size, x.shape[-1], self.features),
                            jnp.float32)
        if self.quant:
            return int8_conv(x, kernel, self.strides, self.padding, dn,
                             out_dtype=self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides, padding=self.padding,
            dimension_numbers=dn)


class QDense(nn.Module):
    """nn.Dense twin with an optional int8 path."""
    features: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        if self.quant:
            y = int8_matmul(x, kernel, out_dtype=self.dtype)
        else:
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + bias.astype(self.dtype)
        return y
