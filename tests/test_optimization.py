"""Golden tests for the BertAdam transformation against an independent
NumPy implementation of the reference update rule (pig/optimization.py:101-177)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.smoke

from peppa_tpu.training.optimization import (
    bert_adam,
    freeze_mask,
    freeze_patterns,
    make_optimizer,
    schedule_fn,
)


def np_bert_adam_run(param, grads, lr=0.1, warmup=0.1, t_total=100,
                     b1=0.9, b2=0.999, e=1e-6, wd=0.01, clip=1.0):
    """Reference semantics in NumPy: per-tensor clip, no bias correction,
    decoupled wd, schedule at pre-increment step."""
    p = param.copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    step = 0
    for g in grads:
        g = g.copy()
        norm = np.linalg.norm(g)
        if clip > 0 and norm > clip:
            g = g * (clip / norm)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        upd = m / (np.sqrt(v) + e) + wd * p
        x = step / t_total
        sched = x / warmup if x < warmup else max((x - 1.0) / (warmup - 1.0), 0.0)
        p = p - lr * sched * upd
        step += 1
    return p


def test_bert_adam_matches_reference_semantics(rng):
    p0 = rng.normal(size=(7,)).astype(np.float32)
    grads = [rng.normal(size=(7,)).astype(np.float32) * 3 for _ in range(5)]

    tx = bert_adam(lr=0.1, warmup=0.1, t_total=100)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    want = np_bert_adam_run(p0, grads)
    np.testing.assert_allclose(np.asarray(params["w"]), want, rtol=1e-5, atol=1e-6)


def test_first_step_lr_is_zero_with_warmup(rng):
    # schedule(0) = 0 for warmup_linear -> first update must be a no-op
    tx = bert_adam(lr=0.5, warmup=0.1, t_total=10)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.ones((3,))}, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)


def test_schedules():
    lin = schedule_fn("warmup_linear", 1.0, 0.1, 100)
    assert float(lin(jnp.asarray(0))) == 0.0
    assert float(lin(jnp.asarray(10))) == pytest.approx(1.0)
    assert float(lin(jnp.asarray(100))) == pytest.approx(0.0)
    assert float(lin(jnp.asarray(55))) == pytest.approx(0.5)
    const = schedule_fn("warmup_constant", 2.0, 0.1, 100)
    assert float(const(jnp.asarray(50))) == pytest.approx(2.0)
    cos = schedule_fn("warmup_cosine", 1.0, 0.1, 100)
    assert float(cos(jnp.asarray(100))) == pytest.approx(0.5 * (1 + np.cos(np.pi)), abs=1e-6)


def test_per_tensor_clipping_independent(rng):
    # two tensors, one with huge grad: only that one is rescaled
    tx = bert_adam(lr=1.0, warmup=-1.0 if False else 0.5, t_total=2,
                   weight_decay=0.0)
    params = {"a": jnp.zeros((4,)), "b": jnp.zeros((4,))}
    state = tx.init(params)
    g = {"a": jnp.full((4,), 100.0), "b": jnp.full((4,), 0.001)}
    # step 0 lr is 0; step 1: lr = 0.5/0.5... run two steps and check moments
    updates, state = tx.update(g, state, params)
    m_a = np.asarray(state[0].m["a"]) if hasattr(state, "inner_state") else np.asarray(state.m["a"])
    clipped_norm = np.linalg.norm(m_a / 0.1)  # m = 0.1 * g_clipped
    assert clipped_norm == pytest.approx(1.0, rel=1e-4)
    m_b = np.asarray(state.m["b"])
    np.testing.assert_allclose(m_b, 0.1 * 0.001, rtol=1e-5)


def test_freeze_mask_patterns():
    params = {
        "audio_encoder": {
            "wav2vec2": {
                "feature_extractor": {"conv0": {"kernel": jnp.ones(1)}},
                "layer0": {"attention": {"q_proj": {"kernel": jnp.ones(1)}}},
                "layer1": {"attention": {"q_proj": {"kernel": jnp.ones(1)}}},
                "aux": {"kernel": jnp.ones(1)},
            }
        },
        "video_encoder": {"project": {"kernel": jnp.ones(1)}},
    }
    pats = freeze_patterns(True, 1)
    mask = freeze_mask(params, pats)
    assert not mask["audio_encoder"]["wav2vec2"]["feature_extractor"]["conv0"]["kernel"]
    assert not mask["audio_encoder"]["wav2vec2"]["layer0"]["attention"]["q_proj"]["kernel"]
    assert mask["audio_encoder"]["wav2vec2"]["layer1"]["attention"]["q_proj"]["kernel"]
    assert mask["audio_encoder"]["wav2vec2"]["aux"]["kernel"]
    assert mask["video_encoder"]["project"]["kernel"]


def test_frozen_params_do_not_move(rng):
    params = {
        "audio_encoder": {"wav2vec2": {"feature_extractor": {"conv0": {"kernel": jnp.ones(3)}},
                                       "aux": {"kernel": jnp.ones(3)}}},
    }

    class OC:
        lr, warmup, schedule, t_total = 0.1, 0.01, "warmup_constant", 100
        b1, b2, e, weight_decay, max_grad_norm = 0.9, 0.999, 1e-6, 0.01, 1.0

    tx = make_optimizer(OC, accumulate_grad_batches=1,
                        freeze_feature_extractor=True, params=params)
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    for _ in range(3):
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(params["audio_encoder"]["wav2vec2"]["feature_extractor"]["conv0"]["kernel"]), 1.0)
    assert float(params["audio_encoder"]["wav2vec2"]["aux"]["kernel"][0]) != 1.0


def test_grad_accumulation_averages(rng):
    class OC:
        lr, warmup, schedule, t_total = 0.1, 0.5, "warmup_constant", 10
        b1, b2, e, weight_decay, max_grad_norm = 0.9, 0.999, 1e-6, 0.0, -1.0

    p0 = {"w": jnp.asarray(rng.normal(size=(4,)).astype(np.float32))}
    # accumulated path: 2 micro grads
    tx_acc = make_optimizer(OC, accumulate_grad_batches=2, params=p0)
    s = tx_acc.init(p0)
    g1 = {"w": jnp.asarray(rng.normal(size=(4,)).astype(np.float32))}
    g2 = {"w": jnp.asarray(rng.normal(size=(4,)).astype(np.float32))}
    p = p0
    for g in (g1, g2):
        u, s = tx_acc.update(g, s, p)
        p = optax.apply_updates(p, u)
    # direct path: one mean grad
    tx = make_optimizer(OC, accumulate_grad_batches=1, params=p0)
    s2 = tx.init(p0)
    gm = {"w": (g1["w"] + g2["w"]) / 2}
    u2, s2 = tx.update(gm, s2, p0)
    want = optax.apply_updates(p0, u2)
    np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(want["w"]), rtol=1e-5)
