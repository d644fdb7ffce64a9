"""Retrieval and triplet metrics, vectorized for the device.

Capability parity: reference pig/metrics.py. The reference computes recall with
a Python loop over rows and bootstrap samples (pig/metrics.py:7-40, 54-77);
here the whole bootstrap (n_samples x size x size similarity + ranking) is one
jit'd program: permutation sampling via `jax.random`, ranking via a single
argsort, and the recall curve as a cumulative sum of gathered correctness —
no host round-trips inside the loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from peppa_tpu.ops.similarity import cosine_matrix, cosine_similarity


def _gathered_correct(candidates: jnp.ndarray, references: jnp.ndarray,
                      correct: jnp.ndarray) -> jnp.ndarray:
    """Correctness matrix reordered by ascending distance per reference row."""
    distances = 1.0 - cosine_matrix(references, candidates)
    ranked = jnp.argsort(distances, axis=1)  # ids ordered by distance, per row
    return jnp.take_along_axis(correct, ranked, axis=1)


def recall_at_n(candidates: jnp.ndarray, references: jnp.ndarray,
                correct: jnp.ndarray, n: int = 1) -> jnp.ndarray:
    """Per-row recall@n: fraction of each row's targets retrieved in the top n.

    Parity: reference pig/metrics.py:7-21. `correct[j, i]` nonzero marks
    candidate i as a target for reference j.
    """
    gathered = _gathered_correct(candidates, references, (correct != 0).astype(jnp.float32))
    overlap = jnp.sum(gathered[:, :n], axis=1)
    targets = jnp.sum((correct != 0).astype(jnp.float32), axis=1)
    return overlap / targets


def recall_at_1_to_n(candidates: jnp.ndarray, references: jnp.ndarray,
                     correct: jnp.ndarray, N: int = 1) -> jnp.ndarray:
    """Full recall curve recall@0..N, shape (N+1, rows).

    Parity: reference pig/metrics.py:23-40 (recall@0 is always zero).
    """
    gathered = _gathered_correct(candidates, references, (correct != 0).astype(jnp.float32))
    targets = jnp.sum((correct != 0).astype(jnp.float32), axis=1)
    cum = jnp.cumsum(gathered, axis=1) / targets[:, None]  # (rows, size)
    curve = jnp.concatenate([jnp.zeros((gathered.shape[0], 1)), cum[:, :N]], axis=1)
    return curve.T  # (N+1, rows)


def triplet_accuracy(anchor: jnp.ndarray, positive: jnp.ndarray,
                     negative: jnp.ndarray, axis: int = 1,
                     discrete: bool = True) -> jnp.ndarray:
    """1 if anchor is closer (cosine) to positive than negative, 0 otherwise.

    Parity: reference pig/metrics.py:45-52 — including sign(0) -> 0.5 for ties.
    With discrete=False returns the raw similarity difference.
    """
    sim_pos = cosine_similarity(anchor, positive, axis=axis)
    sim_neg = cosine_similarity(anchor, negative, axis=axis)
    diff = sim_pos - sim_neg
    if discrete:
        return (jnp.sign(diff) + 1.0) / 2.0
    return diff


@functools.partial(jax.jit, static_argnames=("size", "n_samples", "n"))
def resampled_recall(candidates: jnp.ndarray, references: jnp.ndarray,
                     key: jax.Array, size: int = 100, n_samples: int = 100,
                     n: int = 1) -> jnp.ndarray:
    """Bootstrap recall@n over `n_samples` random subsets of `size` pairs.

    Parity: reference pig/metrics.py:54-64 (identity-matrix correctness). The
    whole bootstrap is a single vmap'd program on device.
    Returns (n_samples, size).
    """
    total = candidates.shape[0]

    def one(k):
        ix = jax.random.permutation(k, total)[:size]
        x = candidates[ix]
        y = references[ix]
        return recall_at_n(x, y, jnp.eye(size), n=n)

    keys = jax.random.split(key, n_samples)
    return jax.vmap(one)(keys)


@functools.partial(jax.jit, static_argnames=("size", "n_samples", "N"))
def resampled_recall_at_1_to_n(candidates: jnp.ndarray, references: jnp.ndarray,
                               key: jax.Array, size: int = 100,
                               n_samples: int = 100, N: int = 1) -> jnp.ndarray:
    """Bootstrap full recall curves; returns (n_samples, N+1, size).

    Parity: reference pig/metrics.py:67-77.
    """
    total = candidates.shape[0]

    def one(k):
        ix = jax.random.permutation(k, total)[:size]
        x = candidates[ix]
        y = references[ix]
        return recall_at_1_to_n(x, y, jnp.eye(size), N=N)

    keys = jax.random.split(key, n_samples)
    return jax.vmap(one)(keys)
