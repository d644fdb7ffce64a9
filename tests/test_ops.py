"""Golden-value tests for similarity, loss and metric primitives.

Goldens are computed with an independent NumPy implementation of the formulas
from the reference (pig/loss.py:41-48, pig/metrics.py:7-77) so the JAX path is
checked against the math, not against itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from peppa_tpu.ops import (
    contrastive,
    cosine_matrix,
    l2_normalize,
    milnce_loss,
    recall_at_1_to_n,
    recall_at_n,
    resampled_recall,
    triplet_accuracy,
    triplet_loss,
)


def np_cosine_matrix(u, v):
    un = u / np.linalg.norm(u, axis=1, keepdims=True)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    return un @ vn.T


def np_contrastive(m, margin=0.2):
    e = -m
    d = np.diag(e)
    c_c = np.clip(margin - e + d[None, :], 0, None)
    c_r = np.clip(margin - e + d[:, None], 0, None)
    c = c_c + c_r
    return (c.sum() - np.diag(c).sum()) / c.shape[0] ** 2


def test_l2_normalize(rng):
    x = rng.normal(size=(4, 16)).astype(np.float32)
    out = np.asarray(l2_normalize(jnp.asarray(x), axis=1))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(out, x / np.linalg.norm(x, axis=1, keepdims=True), rtol=1e-5)


def test_cosine_matrix(rng):
    u = rng.normal(size=(5, 32)).astype(np.float32)
    v = rng.normal(size=(7, 32)).astype(np.float32)
    got = np.asarray(cosine_matrix(jnp.asarray(u), jnp.asarray(v)))
    np.testing.assert_allclose(got, np_cosine_matrix(u, v), atol=1e-5)


def test_contrastive_golden(rng):
    m = np_cosine_matrix(rng.normal(size=(8, 64)).astype(np.float32),
                         rng.normal(size=(8, 64)).astype(np.float32))
    got = float(contrastive(jnp.asarray(m), margin=0.2))
    np.testing.assert_allclose(got, np_contrastive(m, 0.2), rtol=1e-5)


def test_contrastive_zero_at_perfect_separation():
    # identical embeddings -> diagonal = 1, off-diagonal < 1 - margin => loss 0
    v = np.eye(4, dtype=np.float32)
    loss = float(triplet_loss(jnp.asarray(v), jnp.asarray(v), margin=0.2))
    assert loss == pytest.approx(0.0, abs=1e-6)


def test_triplet_loss_matches_contrastive_of_cosine(rng):
    v = rng.normal(size=(6, 32)).astype(np.float32)
    a = rng.normal(size=(6, 32)).astype(np.float32)
    got = float(triplet_loss(jnp.asarray(v), jnp.asarray(a), margin=0.3))
    want = np_contrastive(np_cosine_matrix(v, a), 0.3)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_triplet_loss_differentiable(rng):
    v = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    g = jax.grad(lambda v, a: triplet_loss(v, a))(v, a)
    assert g.shape == v.shape
    assert np.all(np.isfinite(np.asarray(g)))


def test_milnce_golden(rng):
    v = rng.normal(size=(5, 16)).astype(np.float32)
    a = rng.normal(size=(5, 16)).astype(np.float32)
    x = v @ a.T
    num = np.diag(x)
    both = np.concatenate([x, x.T], axis=1)
    den = np.log(np.exp(both).sum(axis=1))
    want = float(np.mean(den - num))
    got = float(milnce_loss(jnp.asarray(v), jnp.asarray(a)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def np_recall_at_n(candidates, references, correct, n):
    distances = 1 - np_cosine_matrix(references, candidates)
    rec = []
    for j, row in enumerate(distances):
        ranked = np.argsort(row, kind="stable")
        topn = ranked[:n]
        target = np.nonzero(correct[j])[0]
        overlap = np.isin(topn, target).sum()
        rec.append(overlap / len(target))
    return np.array(rec)


def test_recall_at_n_golden(rng):
    c = rng.normal(size=(20, 16)).astype(np.float32)
    r = rng.normal(size=(20, 16)).astype(np.float32)
    correct = np.eye(20, dtype=np.float32)
    for n in (1, 5, 10):
        got = np.asarray(recall_at_n(jnp.asarray(c), jnp.asarray(r), jnp.asarray(correct), n=n))
        np.testing.assert_allclose(got, np_recall_at_n(c, r, correct, n), atol=1e-6)


def test_recall_at_n_multi_target(rng):
    c = rng.normal(size=(12, 8)).astype(np.float32)
    r = rng.normal(size=(12, 8)).astype(np.float32)
    correct = np.eye(12, dtype=np.float32)
    correct[0, 3] = 1  # row 0 has two targets
    got = np.asarray(recall_at_n(jnp.asarray(c), jnp.asarray(r), jnp.asarray(correct), n=4))
    np.testing.assert_allclose(got, np_recall_at_n(c, r, correct, 4), atol=1e-6)


def test_recall_curve_golden(rng):
    c = rng.normal(size=(15, 8)).astype(np.float32)
    r = rng.normal(size=(15, 8)).astype(np.float32)
    correct = np.eye(15, dtype=np.float32)
    got = np.asarray(recall_at_1_to_n(jnp.asarray(c), jnp.asarray(r), jnp.asarray(correct), N=10))
    assert got.shape == (11, 15)
    np.testing.assert_allclose(got[0], 0.0)
    for n in (1, 4, 10):
        np.testing.assert_allclose(got[n], np_recall_at_n(c, r, correct, n), atol=1e-6)


def test_triplet_accuracy(rng):
    anchor = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    pos = np.array([[1.0, 0.1], [1.0, 0.0]], dtype=np.float32)
    neg = np.array([[0.0, 1.0], [0.0, 1.0]], dtype=np.float32)
    got = np.asarray(triplet_accuracy(jnp.asarray(anchor), jnp.asarray(pos), jnp.asarray(neg)))
    np.testing.assert_allclose(got, [1.0, 0.0])
    cont = np.asarray(
        triplet_accuracy(jnp.asarray(anchor), jnp.asarray(pos), jnp.asarray(neg), discrete=False)
    )
    assert cont[0] > 0 > cont[1]


def test_resampled_recall_statistics(rng):
    # embed pairs that agree -> recall@1 should be 1 for every bootstrap sample
    emb = rng.normal(size=(150, 32)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    out = np.asarray(resampled_recall(jnp.asarray(emb), jnp.asarray(emb), key,
                                      size=100, n_samples=20, n=1))
    assert out.shape == (20, 100)
    np.testing.assert_allclose(out, 1.0)


def test_resampled_recall_random_baseline(rng):
    # random embeddings: recall@10 from 100 candidates ~ 0.1 in expectation
    c = rng.normal(size=(120, 64)).astype(np.float32)
    r = rng.normal(size=(120, 64)).astype(np.float32)
    key = jax.random.PRNGKey(1)
    out = np.asarray(resampled_recall(jnp.asarray(c), jnp.asarray(r), key,
                                      size=100, n_samples=50, n=10))
    assert 0.05 < out.mean() < 0.15
