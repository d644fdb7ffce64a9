"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from peppa_tpu.ops.loss import triplet_loss
from peppa_tpu.parallel.contrastive import global_negative_loss
from peppa_tpu.parallel.mesh import make_mesh, param_shardings, shard_batch


def test_global_negative_loss_matches_replicated(rng):
    mesh = make_mesh((8, 1), ("data", "model"))
    b, d = 32, 64
    v = rng.normal(size=(b, d)).astype(np.float32)
    a = rng.normal(size=(b, d)).astype(np.float32)
    want = float(triplet_loss(jnp.asarray(v), jnp.asarray(a), margin=0.2,
                              use_pallas=False))
    vs = jax.device_put(v, NamedSharding(mesh, P("data", None)))
    as_ = jax.device_put(a, NamedSharding(mesh, P("data", None)))
    with mesh:
        got = float(jax.jit(
            lambda v, a: global_negative_loss(v, a, mesh, margin=0.2))(vs, as_))
    assert got == pytest.approx(want, rel=1e-5)


def test_global_negative_loss_grads_match(rng):
    mesh = make_mesh((8, 1), ("data", "model"))
    b, d = 16, 32
    v = rng.normal(size=(b, d)).astype(np.float32)
    a = rng.normal(size=(b, d)).astype(np.float32)
    g_ref = jax.grad(lambda v, a: triplet_loss(v, a, margin=0.2,
                                               use_pallas=False),
                     argnums=(0, 1))(jnp.asarray(v), jnp.asarray(a))
    vs = jax.device_put(v, NamedSharding(mesh, P("data", None)))
    as_ = jax.device_put(a, NamedSharding(mesh, P("data", None)))
    with mesh:
        g_sharded = jax.jit(jax.grad(
            lambda v, a: global_negative_loss(v, a, mesh, margin=0.2),
            argnums=(0, 1)))(vs, as_)
    for gr, gs in zip(g_ref, g_sharded):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gs),
                                   rtol=1e-4, atol=1e-6)


def test_tp_param_shardings_applied():
    from peppa_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    mesh = make_mesh((4, 2), ("data", "model"))
    cfg = Wav2Vec2Config(embed_dim=32, num_layers=1, num_heads=4, ffn_dim=64,
                         pos_conv_kernel=16, pos_conv_groups=4)
    enc = Wav2Vec2Encoder(cfg=cfg, use_pallas=False)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))
    shardings = param_shardings(variables["params"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    specs = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec
             for path, s in flat}
    ffn_in = [s for name, s in specs.items() if "ffn_in/kernel" in name]
    assert ffn_in and ffn_in[0] == P(None, "model")
    out_proj = [s for name, s in specs.items() if "out_proj/kernel" in name]
    assert out_proj and out_proj[0] == P("model", None)
    conv = [s for name, s in specs.items() if "feature_extractor" in name
            and name.endswith("kernel")]
    assert conv and conv[0] == P()


def test_pallas_refused_on_multidevice_arrays(rng):
    """Eager misuse guard: a concrete array sharded over >1 devices must take
    the jnp path (the single-block kernel assumes the batch on one core)."""
    from unittest import mock

    mesh = make_mesh((8, 1), ("data", "model"))
    v = rng.normal(size=(16, 64)).astype(np.float32)
    a = rng.normal(size=(16, 64)).astype(np.float32)
    vs = jax.device_put(v, NamedSharding(mesh, P("data", None)))
    as_ = jax.device_put(a, NamedSharding(mesh, P("data", None)))
    with mock.patch("peppa_tpu.ops.pallas.common.use_pallas",
                    side_effect=AssertionError("pallas path taken")):
        got = float(triplet_loss(vs, as_, margin=0.2, use_pallas=True))
    want = float(triplet_loss(jnp.asarray(v), jnp.asarray(a), margin=0.2,
                              use_pallas=False))
    assert got == pytest.approx(want, rel=1e-5)


def test_train_step_uses_global_negative_under_mesh(tmp_path, rng):
    """make_train_step(mesh=...) on a sharded batch reproduces the
    single-device loss — one code path, verified end to end."""
    from peppa_tpu.data.types import ClipBatch
    from peppa_tpu.models.dual_encoder import init_model
    from peppa_tpu.training.optimization import make_optimizer
    from peppa_tpu.training.state import TrainState
    from peppa_tpu.training.step import make_train_step
    from tests.test_training_loop import tiny_config

    cfg = tiny_config(tmp_path)
    mesh = make_mesh((4, 1), ("data", "model"))
    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  audio_samples=1280, video_frames=4)
    tx = make_optimizer(cfg.optimizer, accumulate_grad_batches=1,
                        params=variables["params"])

    b, frames, samples = 8, 4, 1280
    batch = ClipBatch(
        video=rng.uniform(size=(b, frames, 32, 32, 3)).astype(np.float32),
        audio=(rng.normal(size=(b, samples)) * 0.1).astype(np.float32),
        video_duration=np.full(b, 0.8, np.float32),
        audio_duration=np.full(b, 0.8, np.float32),
        video_frames=np.full(b, frames, np.int32),
        audio_samples=np.full(b, samples, np.int32))

    # single device
    state1 = TrainState.create(variables, tx)
    step1 = make_train_step(model, cfg.margin, donate=False)
    _, m1 = step1(state1, jax.tree.map(jnp.asarray, batch),
                  jax.random.PRNGKey(1))

    # sharded over 4 devices with the shard_map global-negative loss
    state2 = TrainState.create(variables, tx)
    with mesh:
        sharded = shard_batch(batch, mesh)
        step2 = make_train_step(model, cfg.margin, donate=False, mesh=mesh)
        _, m2 = step2(state2, sharded, jax.random.PRNGKey(1))
    assert float(m2["train_loss"]) == pytest.approx(
        float(m1["train_loss"]), rel=2e-4)


def test_shard_batch_places_on_data_axis(rng):
    from peppa_tpu.data.types import ClipBatch

    mesh = make_mesh((8, 1), ("data", "model"))
    batch = ClipBatch(
        video=rng.uniform(size=(16, 2, 8, 8, 3)).astype(np.float32),
        audio=rng.normal(size=(16, 100)).astype(np.float32),
        video_duration=np.ones(16, np.float32),
        audio_duration=np.ones(16, np.float32),
        video_frames=np.full(16, 2, np.int32),
        audio_samples=np.full(16, 100, np.int32))
    out = shard_batch(batch, mesh)
    assert out.video.sharding.spec == P("data", None, None, None, None)
    assert out.audio.sharding.spec == P("data", None)
