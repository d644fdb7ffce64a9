"""jit'd train / eval steps over the device mesh.

The reference's Lightning `training_step` (pig/models.py:256-265) and
`validation_step` (pig/models.py:267-288) become pure jit'd functions of
(state, batch): encode both modalities, global-negative contrastive loss,
grads, BertAdam update.  With the batch sharded over the mesh's 'data' axis,
XLA all-gathers the 512-d embeddings (tiny) over ICI for the similarity
matrix and psums the grads — the canonical contrastive-DP recipe from the
north star (BASELINE.json).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from peppa_tpu.data.types import ClipBatch, TripletBatch
from peppa_tpu.ops.loss import triplet_loss
from peppa_tpu.training.state import TrainState


def _data_shards(mesh, axis: str) -> int:
    if mesh is None:
        return 1
    return int(mesh.shape.get(axis, 1))


def make_train_step(model, margin: float, donate: bool = True,
                    mesh=None, data_axis: str = "data",
                    use_global_negative: bool = True) -> Callable:
    """Build the jit'd training step.

    Returns fn(state, batch, rng) -> (state, metrics dict).

    ONE distributed-loss code path: when the batch is sharded over a `mesh`
    data axis with >1 shards, the loss is the explicit shard_map
    global-negative formulation (parallel/contrastive.py) — the single-block
    fused Pallas loss kernel assumes the whole batch in VMEM on one core and
    is only used unsharded.  `use_global_negative=False` falls back to the
    compiler-partitioned jnp loss (never the Pallas kernel) under a >1-shard
    mesh.
    """
    n_shards = _data_shards(mesh, data_axis)

    def compute_loss(v: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
        if n_shards > 1:
            if use_global_negative:
                from peppa_tpu.parallel.contrastive import global_negative_loss

                return global_negative_loss(v, a, mesh, margin=margin,
                                            axis=data_axis)
            return triplet_loss(v, a, margin=margin, use_pallas=False)
        return triplet_loss(v, a, margin=margin)

    def step(state: TrainState, batch: ClipBatch, rng: jax.Array):
        dropout_rng, layerdrop_rng = jax.random.split(
            jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out, mut = model.apply(
                variables, batch, train=True,
                rngs={"dropout": dropout_rng, "layerdrop": layerdrop_rng},
                mutable=mutable)
            loss = compute_loss(out.video, out.audio)
            return loss, mut.get("batch_stats", state.batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        metrics = {"train_loss": loss}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh=None, data_axis: str = "data") -> Callable:
    """jit'd embedding step: ClipBatch -> (V, A) embeddings + loss.

    Parity: reference pig/models.py:267-288 validation_step (embeddings and
    loss; the epoch-end metrics live in evaluation/).  Under a >1-shard data
    mesh the loss uses the compiler-partitioned jnp path — the Pallas kernel
    is single-core.
    """
    sharded = _data_shards(mesh, data_axis) > 1

    def step(variables, batch: ClipBatch):
        out = model.apply(variables, batch, train=False)
        loss = triplet_loss(out.video, out.audio, use_pallas=not sharded)
        return out.video, out.audio, loss

    return jax.jit(step)


def make_predict_step(model) -> Callable:
    """jit'd forward dispatch (ClipBatch or TripletBatch) — reference
    pig/models.py:237-248 via trainer.predict."""

    @functools.partial(jax.jit, static_argnames=("is_triplet",))
    def step(variables, batch, is_triplet: bool = False):
        return model.apply(variables, batch, train=False)

    def run(variables, batch):
        return step(variables, batch, is_triplet=isinstance(batch, TripletBatch))

    return run


def make_encode_steps(model) -> Tuple[Callable, Callable]:
    """jit'd encode_audio / encode_video with tap support (grsa Embedder parity)."""

    @functools.partial(jax.jit, static_argnames=("tap",))
    def encode_audio(variables, audio, tap="embedding"):
        return model.apply(variables, audio, tap=tap,
                           method=model.encode_audio)

    @functools.partial(jax.jit, static_argnames=("tap",))
    def encode_video(variables, video, tap="embedding"):
        return model.apply(variables, video, tap=tap,
                           method=model.encode_video)

    return encode_audio, encode_video
