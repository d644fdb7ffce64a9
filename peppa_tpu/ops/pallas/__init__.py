"""Pallas TPU kernels for the hot ops, with jnp fallbacks.

Every kernel here has a numerically-matching pure-jnp reference path; the
public wrappers dispatch on platform (TPU -> Pallas, else jnp) and the
`interpret=True` mode is used by the CPU test suite to validate kernel
numerics against the references.
"""

from peppa_tpu.ops.pallas.attention import mha_attention
from peppa_tpu.ops.pallas.loss import fused_triplet_loss

__all__ = ["mha_attention", "fused_triplet_loss"]
