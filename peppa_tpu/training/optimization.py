"""BertAdam as an optax gradient transformation, plus freezing masks.

Capability parity: reference pig/optimization.py (the HuggingFace/Google
BertAdam): Adam with

- NO bias correction (reference pig/optimization.py:174-177),
- decoupled weight decay added to the update (not the loss)
  (reference pig/optimization.py:152-153),
- per-parameter-tensor gradient-norm clipping to `max_grad_norm`
  (reference pig/optimization.py:135-137 clips each tensor separately),
- LR schedules warmup_linear / warmup_cosine / warmup_constant driven by
  step/t_total (reference pig/optimization.py:26-49), with the step counter
  read BEFORE increment so the first update uses schedule(0)
  (reference pig/optimization.py:155-172).

Freezing (reference pig/models.py:75-81 sets requires_grad=False) is the
optax-idiomatic `masked` zero-update on matching parameter subtrees.
"""

from __future__ import annotations

import fnmatch
from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def warmup_cosine(x: jnp.ndarray, warmup: float) -> jnp.ndarray:
    return jnp.where(x < warmup, x / warmup, 0.5 * (1.0 + jnp.cos(jnp.pi * x)))


def warmup_constant(x: jnp.ndarray, warmup: float) -> jnp.ndarray:
    return jnp.where(x < warmup, x / warmup, 1.0)


def warmup_linear(x: jnp.ndarray, warmup: float) -> jnp.ndarray:
    # triangular: peak at warmup*t_total, zero at/after t_total
    return jnp.where(x < warmup, x / warmup,
                     jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0))


SCHEDULES = {
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
    "warmup_linear": warmup_linear,
}


def schedule_fn(schedule: str, lr: float, warmup: float, t_total: int
                ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Scheduled LR at integer step (pre-increment step semantics)."""
    fct = SCHEDULES[schedule]

    def fn(step):
        if t_total == -1:
            return jnp.asarray(lr, jnp.float32)
        x = step.astype(jnp.float32) / t_total
        return lr * fct(x, warmup)

    return fn


class BertAdamState(NamedTuple):
    step: jnp.ndarray  # int32 scalar
    m: Any
    v: Any


def bert_adam(lr: float = 1e-4,
              warmup: float = 0.1,
              t_total: int = 15000,
              schedule: str = "warmup_linear",
              b1: float = 0.9,
              b2: float = 0.999,
              e: float = 1e-6,
              weight_decay: float = 0.01,
              max_grad_norm: float = 1.0) -> optax.GradientTransformation:
    """The reference update rule, parameter-shape agnostic and jit-friendly."""
    if schedule not in SCHEDULES:
        raise ValueError(f"Invalid schedule parameter: {schedule}")
    lr_at = schedule_fn(schedule, lr, warmup, t_total)

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return BertAdamState(step=jnp.zeros((), jnp.int32), m=zeros,
                             v=jax.tree.map(jnp.zeros_like, params))

    def clip_one(g):
        if max_grad_norm <= 0:
            return g
        norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
        scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(norm, 1e-12))
        return (g * scale).astype(g.dtype)

    def update(grads, state, params):
        if params is None:
            raise ValueError("bert_adam requires params for weight decay")
        grads = jax.tree.map(clip_one, grads)
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state.v, grads)
        lr_t = lr_at(state.step)

        def one(m_, v_, p):
            upd = m_ / (jnp.sqrt(v_) + e)
            if weight_decay > 0:
                upd = upd + weight_decay * p
            return (-lr_t * upd).astype(p.dtype)

        updates = jax.tree.map(one, m, v, params)
        return updates, BertAdamState(step=state.step + 1, m=m, v=v)

    return optax.GradientTransformation(init, update)


# ------------------------------------------------------------------ freezing

def freeze_patterns(freeze_feature_extractor: bool,
                    freeze_encoder_layers: Optional[int]) -> Sequence[str]:
    """Path glob patterns for frozen parameter subtrees.

    Parity: reference pig/models.py:75-81 — the conv feature extractor and/or
    the first N transformer layers of the audio trunk; plus the static image
    encoder's fc (reference pig/models.py:164-166) has no equivalent here
    because our trunk carries no classification head.
    """
    pats = []
    if freeze_feature_extractor:
        pats.append("audio_encoder/wav2vec2/feature_extractor/*")
    if freeze_encoder_layers:
        for i in range(freeze_encoder_layers):
            pats.append(f"audio_encoder/wav2vec2/layer{i}/*")
    return pats


def freeze_mask(params, patterns: Sequence[str]):
    """Pytree of bools: True where the parameter is trainable."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def trainable(path):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return not any(fnmatch.fnmatch(name, pat) for pat in patterns)

    mask_leaves = [trainable(p) for p, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, mask_leaves)


def make_optimizer(opt_cfg, accumulate_grad_batches: int = 1,
                   freeze_feature_extractor: bool = False,
                   freeze_encoder_layers: Optional[int] = None,
                   params=None) -> optax.GradientTransformation:
    """Full training transformation: freeze -> bert_adam -> grad accumulation.

    Matches the reference stack: Lightning accumulate_grad_batches=8 averages
    micro-batch grads before each BertAdam step (hparams_base.yaml:42).
    """
    tx = bert_adam(lr=opt_cfg.lr, warmup=opt_cfg.warmup, t_total=opt_cfg.t_total,
                   schedule=opt_cfg.schedule, b1=opt_cfg.b1, b2=opt_cfg.b2,
                   e=opt_cfg.e, weight_decay=opt_cfg.weight_decay,
                   max_grad_norm=opt_cfg.max_grad_norm)
    patterns = freeze_patterns(freeze_feature_extractor, freeze_encoder_layers)
    if patterns and params is not None:
        mask = freeze_mask(params, patterns)
        not_mask = jax.tree.map(lambda t: not t, mask)
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), not_mask),
            optax.masked(tx, mask),
        )
    if accumulate_grad_batches and accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches,
                              use_grad_mean=True)
    return tx
