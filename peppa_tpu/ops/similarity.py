"""Similarity primitives shared by the loss and the retrieval metrics.

Capability parity: reference pig/util.py:9-13 (cosine_matrix) and the L2
normalization applied at the end of every encoder (reference pig/models.py:108,
149, 199).  All functions are pure jnp, jit/vmap/grad-safe, and upcast the
contraction to float32 so bf16 activations keep full-precision similarity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize `x` to unit L2 norm along `axis`."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x / jnp.maximum(norm, eps).astype(x.dtype)).astype(x.dtype)


def cosine_matrix(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Matrix of cosine similarities between each row of `u` and each row of `v`.

    Returns a float32 (len(u), len(v)) matrix; the matmul rides the MXU with a
    float32 accumulator regardless of the input dtype.
    """
    u_n = l2_normalize(u, axis=1).astype(jnp.float32)
    v_n = l2_normalize(v, axis=1).astype(jnp.float32)
    # HIGHEST: retrieval ranking is sensitive to similarity precision; this
    # matmul is negligible next to the encoders, so pay for exact float32.
    return jnp.matmul(u_n, v_n.T, precision=jax.lax.Precision.HIGHEST)


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, axis: int = 1,
                      eps: float = 1e-8) -> jnp.ndarray:
    """Row-wise cosine similarity (parity with torch.nn.functional.cosine_similarity)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    dot = jnp.sum(a * b, axis=axis)
    na = jnp.linalg.norm(a, axis=axis)
    nb = jnp.linalg.norm(b, axis=axis)
    return dot / jnp.maximum(na * nb, eps)
