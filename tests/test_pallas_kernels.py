"""Numerics tests for the Pallas TPU kernels, run in interpreter mode on CPU
against the pure-jnp reference paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peppa_tpu.ops.loss import triplet_loss
from peppa_tpu.ops.pallas.attention import mha_attention, mha_attention_reference
from peppa_tpu.ops.pallas.loss import fused_triplet_loss


@pytest.mark.parametrize("t,lengths", [(64, None), (120, (120, 80, 33, 1))])
def test_attention_matches_reference(rng, t, lengths):
    b, h, hd = 4, 3, 32
    q = jnp.asarray(rng.normal(size=(b, t, h, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, hd)).astype(np.float32))
    lens = jnp.asarray(lengths, jnp.int32) if lengths else None
    out = mha_attention(q, k, v, lengths=lens, interpret=True)
    ref = mha_attention_reference(q, k, v, lengths=lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_attention_grads_match_reference(rng):
    b, t, h, hd = 2, 48, 2, 16
    q = jnp.asarray(rng.normal(size=(b, t, h, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, hd)).astype(np.float32))

    def f_pallas(q, k, v):
        return jnp.sum(jnp.square(mha_attention(q, k, v, interpret=True)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.square(mha_attention_reference(q, k, v)))

    g_pallas = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gp, gr in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_attention_bf16_close(rng):
    b, t, h, hd = 2, 40, 2, 16
    mk = lambda: jnp.asarray(rng.normal(size=(b, t, h, hd))
                             .astype(np.float32)).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    out = mha_attention(q, k, v, interpret=True)
    ref = mha_attention_reference(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("b,d", [(8, 512), (13, 100)])
def test_fused_loss_matches_reference(rng, b, d):
    v = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    got = fused_triplet_loss(v, a, 0.2, True)
    want = triplet_loss(v, a, margin=0.2)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)


def test_fused_loss_grads_match_reference(rng):
    b, d = 10, 64
    v = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    g_fused = jax.grad(lambda v, a: fused_triplet_loss(v, a, 0.2, True),
                       argnums=(0, 1))(v, a)
    g_ref = jax.grad(lambda v, a: triplet_loss(v, a, margin=0.2),
                     argnums=(0, 1))(v, a)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-6)
