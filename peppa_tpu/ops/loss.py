"""Contrastive losses over the cross-modal similarity matrix.

Capability parity: reference pig/loss.py.
- `contrastive` — max-margin loss with all in-batch negatives, hinged on both
  rows and columns of the cosine matrix against its diagonal
  (reference pig/loss.py:41-48).
- `milnce_loss` — the (unused-by-default) MIL-NCE alternative
  (reference pig/loss.py:5-26).

Everything here is a pure function of embeddings, differentiable and
shardable: under a `Mesh` with the batch dimension sharded, `jnp.matmul`
inside `cosine_matrix` makes XLA all-gather the embeddings over ICI so each
device computes its rows of the global similarity matrix (see
peppa_tpu/parallel/contrastive.py for the explicit shard_map formulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from peppa_tpu.ops.similarity import cosine_matrix


def _is_multidevice(x) -> bool:
    """True for a concrete jax.Array placed across >1 devices (eager misuse
    guard; tracers have no committed sharding and return False)."""
    try:
        return len(x.sharding.device_set) > 1
    except Exception:
        return False


def contrastive(m: jnp.ndarray, margin: float = 0.2) -> jnp.ndarray:
    """Contrastive margin loss over a similarity matrix `m`.

    For similarity matrix M with matched pairs on the diagonal, penalizes every
    off-diagonal entry that comes within `margin` of its row's and its column's
    diagonal entry:

        C_c[i, j] = max(0, margin + M[i, j] - M[j, j])   (column-wise hinge)
        C_r[i, j] = max(0, margin + M[i, j] - M[i, i])   (row-wise hinge)
        loss = (sum(C_c + C_r) - trace(C_c + C_r)) / B**2
    """
    m = m.astype(jnp.float32)
    diag = jnp.diagonal(m)
    # hinge against the column's positive pair (diag broadcast along rows)
    c_col = jnp.maximum(margin + m - diag[None, :], 0.0)
    # hinge against the row's positive pair (diag broadcast along columns)
    c_row = jnp.maximum(margin + m - diag[:, None], 0.0)
    c = c_col + c_row
    b = m.shape[0]
    return (jnp.sum(c) - jnp.sum(jnp.diagonal(c))) / (b * b)


def triplet_loss(v: jnp.ndarray, a: jnp.ndarray, margin: float = 0.2,
                 use_pallas: bool = True) -> jnp.ndarray:
    """Triplet margin loss between video embeddings `v` and audio embeddings `a`.

    Parity: reference pig/loss.py:28-39 (TripletLoss.forward).  On TPU the
    normalize+matmul+hinge chain runs as one fused Pallas kernel
    (ops/pallas/loss.py); elsewhere the jnp path below.
    """
    # The single-block kernel assumes the whole batch on ONE core: refuse it
    # for concrete arrays already sharded over multiple devices (the jnp path
    # below partitions fine). Inside jit the deciders are the step factories
    # (training/step.py), which know the mesh.
    if use_pallas and _is_multidevice(v):
        use_pallas = False
    # VMEM budget: the fused kernel holds both (B_pad, D) embedding blocks
    # AND the (B_pad, B_pad) f32 score block in VMEM; past ~1024 rows the
    # score block alone (4 MB at B=1024, 64 MB at B=4096) blows the ~16 MB
    # budget, so fall through to the jnp path (XLA tiles it fine).
    if use_pallas and v.ndim == 2 and v.shape[0] <= 1024:
        from peppa_tpu.ops.pallas.common import use_pallas as pallas_ok

        if pallas_ok():
            from peppa_tpu.ops.pallas.loss import fused_triplet_loss

            return fused_triplet_loss(v, a, margin)
    return contrastive(cosine_matrix(v, a), margin=margin)


def milnce_loss(v: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """MIL-NCE loss: log(pos / (pos + neg/2)) - log 2, HowTo100M-style.

    Parity: reference pig/loss.py:5-26 (MILNCELoss.forward), for the case of
    one candidate per clip (x reshaped (B, B, 1)).
    """
    v = v.astype(jnp.float32)
    a = a.astype(jnp.float32)
    x = jnp.matmul(v, a.T, precision=jax.lax.Precision.HIGHEST)  # (B, B)
    numerator = jnp.diagonal(x)  # logsumexp over a single element is identity
    # denominator: concat similarities in both directions per anchor
    both = jnp.concatenate([x, x.T], axis=1)  # (B, 2B)
    denominator = jnp.max(both, axis=1) + jnp.log(
        jnp.sum(jnp.exp(both - jnp.max(both, axis=1, keepdims=True)), axis=1)
    )
    return jnp.mean(denominator - numerator)
