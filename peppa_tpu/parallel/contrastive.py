"""Explicit shard_map formulation of the global-negative contrastive loss.

Under plain jit over a ('data',) mesh the compiler already inserts the right
collectives for `triplet_loss` (all-gather of the 512-d embeddings over ICI,
then each device computes its rows of the global similarity matrix).  This
module spells the same program out with `shard_map` + `jax.lax.all_gather`
for two reasons:

- it pins the communication pattern (embeddings travel, never activations:
  ~B x 512 x 4 bytes per step, trivially ICI-bound) instead of trusting the
  partitioner as batch sizes scale;
- each device materializes only its (B_local, B_global) slab of the
  similarity matrix — the full (B_global, B_global) matrix never exists on
  any single chip, which is what makes very large global batches feasible.

The per-device loss terms sum exactly to the replicated-loss value because
`contrastive` hinges are elementwise over matrix entries with row/column
diagonal broadcasts (reference pig/loss.py:41-48): row-hinge terms live with
the row owner; column-hinge terms are computed by the row owner against the
gathered diagonal and psum'd.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from peppa_tpu.ops.similarity import l2_normalize


def _local_terms(v_local: jnp.ndarray, a_local: jnp.ndarray, margin: float,
                 axis: str):
    """Per-shard loss numerator; runs inside shard_map."""
    idx = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)
    b_local = v_local.shape[0]

    v_n = l2_normalize(v_local.astype(jnp.float32), axis=1)
    a_n = l2_normalize(a_local.astype(jnp.float32), axis=1)
    # gather the (small) embeddings, not the similarity matrix
    a_all = jax.lax.all_gather(a_n, axis, tiled=True)  # (B_global, D)
    v_all = jax.lax.all_gather(v_n, axis, tiled=True)

    # my rows of the global matrix: M[i_global, :] for my i's
    m_rows = v_n @ a_all.T  # (B_local, B_global)
    # global diagonal (each device recomputes it from the gathered copies —
    # cheaper than gathering diag separately)
    diag = jnp.sum(v_all * a_all, axis=1)  # (B_global,)
    my_diag = jax.lax.dynamic_slice_in_dim(diag, idx * b_local, b_local)

    row_ids = idx * b_local + jnp.arange(b_local)
    col_ids = jnp.arange(n_dev * b_local)
    off_diag = row_ids[:, None] != col_ids[None, :]

    # column hinge: margin + M[i, j] - M[j, j]
    c_col = jnp.maximum(margin + m_rows - diag[None, :], 0.0)
    # row hinge: margin + M[i, j] - M[i, i]
    c_row = jnp.maximum(margin + m_rows - my_diag[:, None], 0.0)
    local_sum = jnp.sum(jnp.where(off_diag, c_col + c_row, 0.0))
    return jax.lax.psum(local_sum, axis)


def global_negative_loss(v: jnp.ndarray, a: jnp.ndarray, mesh: Mesh,
                         margin: float = 0.2, axis: str = "data"
                         ) -> jnp.ndarray:
    """triplet_loss over a batch sharded on `axis`, with explicit collectives.

    `v`/`a`: (B_global, D) arrays sharded over their leading axis.  Returns
    the same scalar as ops.loss.triplet_loss on the gathered batch.
    """
    fn = jax.shard_map(
        functools.partial(_local_terms, margin=margin, axis=axis),
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(),
    )
    total = fn(v, a)
    b = v.shape[0]
    return total / (b * b)
