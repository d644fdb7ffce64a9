"""Device mesh construction and sharding specs.

The reference is single-GPU (SURVEY.md §2.10); this module is the TPU-native
scaling layer designed from the north star: a ('data', 'model') mesh where

- the batch is sharded over 'data' (DP); the global-negative contrastive loss
  emerges from jit inserting an all-gather of the embeddings over ICI when the
  similarity matmul crosses the sharded batch axis;
- optionally, the wav2vec2 transformer's attention heads and FFN are sharded
  over 'model' (TP) via parameter partition rules — not required at 127 M
  params but wired so bigger encoders drop in.

Collectives ride ICI because both axes live inside one slice; nothing here
ever talks NCCL/MPI (reference had none either, SURVEY.md §5.8).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              axes: Sequence[str] = ("data", "model"),
              devices=None) -> Mesh:
    """Build a Mesh; default: all devices on 'data', 'model' size 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n,) + (1,) * (len(axes) - 1)
    need = int(np.prod(mesh_shape))
    if need > n:
        raise ValueError(f"mesh_shape {mesh_shape} needs {need} devices, "
                         f"have {n}")
    dev_array = np.asarray(devices[:need]).reshape(mesh_shape)
    return Mesh(dev_array, tuple(axes))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a host batch with the leading axis sharded over `axis`.

    Single-process: `batch` is the global batch. Multi-process: `batch` is
    this process's LOCAL slab of the global batch — every process must
    present the same local shape at the same step (the data module's
    `multihost_interleave` guarantees this), and the global batch is the
    concatenation over processes (global B = process_count * local B), built
    with `jax.make_array_from_process_local_data` so no process ever needs
    rows it didn't load.
    """
    multiproc = _process_count() > 1

    def put(x):
        if x is None:
            return None
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate_batch(batch: Any, mesh: Mesh) -> Any:
    """Fully replicate a host batch across a (possibly multi-process) mesh.

    Used for validation under multi-host: every process iterates the same
    validation loaders, so treating those rows as process-local slabs would
    duplicate each clip process_count times in the global batch and corrupt
    the retrieval metrics. Replication keeps eval semantics exact.
    """
    multiproc = _process_count() > 1
    sharding = NamedSharding(mesh, P())

    def put(x):
        if x is None:
            return None
        x = np.asarray(x)
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def _process_count() -> int:
    from peppa_tpu.utils import dist

    return dist.process_count()


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


# ------------------------------------------------------------ TP param rules

# (path regex, partition spec builder) — applied in order, first match wins.
# Paths are '/'-joined flax param paths.  Specs shard the *weights* of the
# wav2vec2 transformer over the 'model' axis: QKV/FFN-in on output features,
# out-proj/FFN-out on input features (Megatron-style pairing so the only
# cross-shard op is the activation all-reduce XLA inserts).
_TP_RULES: Tuple[Tuple[str, Any], ...] = (
    (r".*wav2vec2/layer\d+/attention/(q|k|v)_proj/kernel", lambda: P(None, "model")),
    (r".*wav2vec2/layer\d+/attention/(q|k|v)_proj/bias", lambda: P("model")),
    (r".*wav2vec2/layer\d+/attention/out_proj/kernel", lambda: P("model", None)),
    (r".*wav2vec2/layer\d+/ffn_in/kernel", lambda: P(None, "model")),
    (r".*wav2vec2/layer\d+/ffn_in/bias", lambda: P("model")),
    (r".*wav2vec2/layer\d+/ffn_out/kernel", lambda: P("model", None)),
)


def _spec_for(name: str, ndim: int, use_tp: bool) -> P:
    if use_tp:
        for pattern, spec in _TP_RULES:
            if re.fullmatch(pattern, name):
                s = spec()
                if ndim >= len(s):
                    return s
    return P()


def param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = True) -> Any:
    """NamedSharding tree for any param-shaped pytree: replicated + TP rules.

    Works on the full TrainState too: optimizer moments nest the param tree,
    so their paths end with the same param names and pick up the same specs.
    """
    use_tp = tensor_parallel and mesh.shape.get("model", 1) > 1

    def spec_for(path, value):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        ndim = getattr(value, "ndim", 0)
        return NamedSharding(mesh, _spec_for(name, ndim, use_tp))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def state_shardings(state, mesh: Mesh, tensor_parallel: bool = True):
    """Shardings for a full TrainState (params + moments TP-sharded, rest replicated)."""
    return param_shardings(state, mesh, tensor_parallel)
