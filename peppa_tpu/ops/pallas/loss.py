"""Fused L2-normalize + cosine-matrix + contrastive-margin loss kernel.

The north-star fused similarity+loss op (SURVEY.md §2.9): the reference
computes `contrastive(cosine_matrix(V, A))` (pig/loss.py:39-48) as a chain of
separate ops — two normalizations, a matmul, two broadcast hinges and
reductions — each round-tripping the (B, B) similarity matrix and the (B, D)
embeddings through HBM.  Here the whole forward runs in one Pallas program:
both embedding blocks live in VMEM, the similarity matmul rides the MXU, and
the hinge + reduction happen on the VPU before a single scalar leaves the
kernel.

The backward pass is closed-form (hinge indicators are recomputed from the
saved normalized embeddings) and cheap; it runs as plain XLA since the
training step's cost is dominated by the encoders, not this op.

Batch sizes here are contrastive-training sized (<= ~4096 rows of 512), so a
single-block kernel is the right shape: (4096, 512) f32 x 2 = 16 MB is the
ceiling; typical (256, 512) uses ~0.5 MB of VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from peppa_tpu.ops.pallas.common import round_up


def _norm_rows(x: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(n, 1e-12)


def _loss_kernel(b_real: int, margin: float, v_ref, a_ref, o_ref):
    v = _norm_rows(v_ref[...].astype(jnp.float32))
    a = _norm_rows(a_ref[...].astype(jnp.float32))
    m = jax.lax.dot_general(v, a, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (Bp, Bp)
    rows = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    pad = (rows >= b_real) | (cols >= b_real)
    on_diag = rows == cols
    diag_col = jnp.sum(jnp.where(on_diag, m, 0.0), axis=0, keepdims=True)  # M[j,j] per col
    diag_row = jnp.sum(jnp.where(on_diag, m, 0.0), axis=1, keepdims=True)  # M[i,i] per row
    c = (jnp.maximum(margin + m - diag_col, 0.0)
         + jnp.maximum(margin + m - diag_row, 0.0))
    c = jnp.where(pad | on_diag, 0.0, c)
    o_ref[0, 0] = jnp.sum(c) / (b_real * b_real)


def _fused_loss_fwd_call(v, a, margin: float, interpret: bool):
    b, d = v.shape
    b_pad = round_up(max(b, 8), 8)
    d_pad = round_up(d, 128)
    if (b_pad, d_pad) != (b, d):
        v = jnp.pad(v, ((0, b_pad - b), (0, d_pad - d)))
        a = jnp.pad(a, ((0, b_pad - b), (0, d_pad - d)))
    out = pl.pallas_call(
        functools.partial(_loss_kernel, b, margin),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(v, a)
    return out[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_triplet_loss(v, a, margin: float = 0.2, interpret: bool = False):
    """contrastive(cosine_matrix(v, a), margin) as one fused TPU kernel.

    Drop-in for peppa_tpu.ops.loss.triplet_loss (reference pig/loss.py:28-48).
    """
    return _fused_loss_fwd_call(v, a, margin, interpret)


def _fwd(v, a, margin, interpret):
    loss = _fused_loss_fwd_call(v, a, margin, interpret)
    return loss, (v, a)


def _bwd(margin, interpret, res, g):
    """Closed-form gradient of the contrastive hinge loss.

    With N_v/N_a the row-normalized embeddings and M = N_v N_a^T:
      dL/dM[i,j] (i != j) = (1[col hinge ij active] + 1[row hinge ij active]) / B^2
      dL/dM[j,j] -= sum_i 1[col hinge ij active] / B^2   (column hinge)
      dL/dM[i,i] -= sum_j 1[row hinge ij active] / B^2   (row hinge)
    then chain through the matmul and the L2 normalization.
    """
    v, a = res
    v32 = v.astype(jnp.float32)
    a32 = a.astype(jnp.float32)
    nv = jnp.maximum(jnp.linalg.norm(v32, axis=1, keepdims=True), 1e-12)
    na = jnp.maximum(jnp.linalg.norm(a32, axis=1, keepdims=True), 1e-12)
    vn = v32 / nv
    an = a32 / na
    m = vn @ an.T
    b = m.shape[0]
    diag = jnp.diagonal(m)
    eye = jnp.eye(b, dtype=bool)
    col_active = ((margin + m - diag[None, :]) > 0) & ~eye
    row_active = ((margin + m - diag[:, None]) > 0) & ~eye
    g_m = (col_active.astype(jnp.float32) + row_active.astype(jnp.float32))
    g_m -= jnp.diag(jnp.sum(col_active, axis=0).astype(jnp.float32))
    g_m -= jnp.diag(jnp.sum(row_active, axis=1).astype(jnp.float32))
    g_m = g_m * (g / (b * b))
    # through the matmul
    d_vn = g_m @ an
    d_an = g_m.T @ vn
    # through the normalization: d_x = (d_n - n * <d_n, n>) / |x|
    d_v = (d_vn - vn * jnp.sum(d_vn * vn, axis=1, keepdims=True)) / nv
    d_a = (d_an - an * jnp.sum(d_an * an, axis=1, keepdims=True)) / na
    return d_v.astype(v.dtype), d_a.astype(a.dtype)


fused_triplet_loss.defvjp(_fwd, _bwd)
