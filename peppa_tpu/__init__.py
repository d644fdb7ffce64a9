"""peppa_tpu — a TPU-native (JAX/XLA/Pallas) visually-grounded speech framework.

A from-scratch rebuild of the capabilities of gchrupala/peppa ("Learning English
with Peppa Pig", TACL 2022): a dual audio/video encoder trained with an in-batch
contrastive triplet loss over the cosine similarity matrix, plus the full data,
training, evaluation and analysis stack around it — designed TPU-first:

- compute path: JAX/XLA with Pallas kernels for the hot ops,
- parallelism: `jax.sharding.Mesh` + jit/shard_map with ICI collectives
  (all-gather of video embeddings for large-negative contrastive training),
- bf16 matmuls on the MXU, static shapes via duration-bucketed batching,
- host-side decode + a native C++ clip-cache loader feeding the device.

Reference parity is documented per-module with `file:line` citations into the
reference implementation (see SURVEY.md).
"""

__version__ = "0.1.0"
