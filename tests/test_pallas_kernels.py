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


def test_mha_under_model_sharded_mesh(rng):
    """Pallas attention fed HEAD-SHARDED q/k/v under a (1, 2) mesh.

    If TP shards the head axis, GSPMD partitions the pallas custom call by
    replicate-and-gather; this proves that path computes the right values
    AND gradients (no silent corruption) — the model still prefers the XLA
    einsum under TP for efficiency (models/dual_encoder.py setup guard).
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    b, t, h, hd = 2, 37, 4, 16
    q = jnp.asarray(rng.standard_normal((b, t, h, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, hd)).astype(np.float32))
    lens = jnp.asarray([37, 20], np.int32)

    want = np.asarray(mha_attention_reference(q, k, v, lengths=lens))
    gref = jax.jit(jax.grad(
        lambda q, k, v, l: jnp.sum(mha_attention_reference(
            q, k, v, lengths=l) ** 2), argnums=(0, 1, 2)))
    want_g = jax.tree.map(np.asarray, gref(q, k, v, lens))

    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2),
                ("data", "model"))
    shard = NamedSharding(mesh, P(None, None, "model", None))
    qs, ks, vs = (jax.device_put(x, shard) for x in (q, k, v))
    ls = jax.device_put(lens, NamedSharding(mesh, P()))
    fwd = jax.jit(lambda q, k, v, l: mha_attention(q, k, v, lengths=l,
                                                   interpret=True))
    bwd = jax.jit(jax.grad(
        lambda q, k, v, l: jnp.sum(mha_attention(
            q, k, v, lengths=l, interpret=True) ** 2), argnums=(0, 1, 2)))
    with mesh:
        got = np.asarray(fwd(qs, ks, vs, ls))
        got_g = jax.tree.map(np.asarray, bwd(qs, ks, vs, ls))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    for gg, gw in zip(got_g, want_g):
        np.testing.assert_allclose(gg, gw, rtol=1e-4, atol=1e-5)


def test_tp_mesh_config_prefers_xla_attention():
    """The model built with a model-axis>1 mesh must NOT take the Pallas
    attention path (the guard in PeppaPig.setup)."""
    from peppa_tpu.config import default_config
    from peppa_tpu.models.dual_encoder import PeppaPig

    cfg = default_config()
    cfg.tpu.mesh_shape = (1, 2)
    model = PeppaPig(cfg)
    model = model.bind({"params": {}})  # setup() needs a scope; params unused
    assert model.audio_encoder.use_pallas is False

    cfg2 = default_config()
    cfg2.tpu.mesh_shape = (8, 1)
    m2 = PeppaPig(cfg2).bind({"params": {}})
    assert m2.audio_encoder.use_pallas is True
