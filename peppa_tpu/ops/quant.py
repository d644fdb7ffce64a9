"""W8A8 dynamic post-training quantization primitives for the inference path.

TPU-native rationale: the MXU executes int8xint8->int32 at ~6.5x the bf16
rate on this chip (measured: 491.9 vs 75.7 TF/s, scripts/perf_probe.py peak),
so the compute-bound encode path (PERF.md: ~85% of bf16 practical peak) can
only be made meaningfully faster by dropping to int8.  No reference
equivalent (the reference serves fp16 CUDA); this is a beyond-parity serving
feature, opt-in and quality-gated (tests/test_quant.py, PERF.md).

Scheme (standard symmetric W8A8):
- weights: per-output-channel absmax scales, quantized once per program
  (XLA hoists the loop-invariant quantization out of scan loops);
- activations: dynamic per-tensor absmax scale computed on the fly;
  symmetric quantization maps 0 -> 0 exactly, so zero-padding semantics
  (SURVEY.md "padding discipline") survive quantization bit-exactly;
- accumulation in int32 on the MXU, dequantized into the requested float
  dtype by the fused epilogue.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Q_MAX = 127.0


def absmax_weight_scale(w: jnp.ndarray, out_axis: int = -1) -> jnp.ndarray:
    """Per-output-channel scale: max|w| over all other axes / 127."""
    axes = tuple(i for i in range(w.ndim) if i != (out_axis % w.ndim))
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axes, keepdims=True)
    return jnp.maximum(amax, 1e-12) / Q_MAX


def quantize_int8(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -Q_MAX, Q_MAX).astype(jnp.int8)


def act_scale(x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic per-tensor activation scale (scalar)."""
    return jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12) / Q_MAX


def int8_conv(x: jnp.ndarray, w: jnp.ndarray,
              window_strides: Sequence[int],
              padding,
              dimension_numbers: Tuple[str, str, str],
              out_dtype: jnp.dtype = jnp.bfloat16) -> jnp.ndarray:
    """Quantized drop-in for lax.conv_general_dilated (float w, DHWIO-style).

    `w`'s output-channel axis is taken from dimension_numbers[1]'s 'O'.
    """
    o_axis = dimension_numbers[1].index("O")
    w_scale = absmax_weight_scale(w, o_axis)
    w_q = quantize_int8(w, w_scale)
    s_x = act_scale(x)
    x_q = quantize_int8(x, s_x)
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=window_strides, padding=padding,
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.int32)
    # move the per-O weight scale to the output's channel axis
    out_c_axis = dimension_numbers[2].index("C")
    shape = [1] * y.ndim
    shape[out_c_axis] = y.shape[out_c_axis]
    scale = (s_x * w_scale.reshape(-1)).reshape(shape)
    return (y.astype(jnp.float32) * scale).astype(out_dtype)


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray,
                out_dtype: jnp.dtype = jnp.bfloat16) -> jnp.ndarray:
    """Quantized x @ w for (..., K) @ (K, N) with per-N weight scales."""
    w_scale = absmax_weight_scale(w, 1)  # (1, N)
    w_q = quantize_int8(w, w_scale)
    s_x = act_scale(x)
    x_q = quantize_int8(x, s_x)
    y = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s_x * w_scale.reshape(-1))
            ).astype(out_dtype)
