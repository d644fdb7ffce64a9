"""On-chip Pallas kernel numerics: real-TPU lowering vs jnp reference.

VERDICT r2 #4: the Pallas kernels were numerics-verified only in interpret
mode on CPU; this script runs `mha_attention` and `fused_triplet_loss`
(forward AND backward) on the real TPU against the pure-jnp reference
implementations and prints the max|delta| per dtype — the committed table
lives in PERF.md "On-chip Pallas kernel numerics".  The hardware-gated test
twin is tests/test_pallas_onchip.py.

Reference semantics being matched: torch SDPA inside torchaudio's wav2vec2
(pig/models.py:82-84) and the contrastive hinge (pig/loss.py:41-48).

Usage: python scripts/pallas_onchip_numerics.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _maxd(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64) -
                               np.asarray(b, np.float64))))


def attention_deltas(dtype, with_lengths: bool, interpret: bool = False):
    """max|delta| of out / dq / dk / dv between kernel and jnp reference."""
    from peppa_tpu.ops.pallas.attention import (mha_attention,
                                                mha_attention_reference)

    b, t, h, hd = 8, 317, 12, 64  # the model's working shape (2.3 s clips)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, t, h, hd)), dtype)
               for _ in range(3))
    lengths = (jnp.asarray(rng.integers(t // 2, t + 1, (b,)), jnp.int32)
               if with_lengths else None)

    # cosine-like readout so grads exercise every position — drawn ONCE so
    # both closures differentiate the identical scalar function
    w = jnp.asarray(rng.standard_normal((h, hd)), jnp.float32)

    def scalarize(fn):
        def f(q, k, v):
            out = fn(q, k, v, lengths).astype(jnp.float32)
            return jnp.sum(out * w), out

        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2), has_aux=True))

    import functools
    pl_fn = scalarize(functools.partial(mha_attention, interpret=interpret))
    ref_fn = scalarize(mha_attention_reference)
    (_, out_pl), g_pl = jax.tree.map(np.asarray, pl_fn(q, k, v))
    (_, out_ref), g_ref = jax.tree.map(np.asarray, ref_fn(q, k, v))
    return {"out": _maxd(out_pl, out_ref),
            "dq": _maxd(g_pl[0], g_ref[0]),
            "dk": _maxd(g_pl[1], g_ref[1]),
            "dv": _maxd(g_pl[2], g_ref[2])}


def loss_deltas(dtype, b: int = 256, interpret: bool = False):
    """max|delta| of loss / dv / da between fused kernel and jnp autodiff."""
    from peppa_tpu.ops.loss import contrastive
    from peppa_tpu.ops.pallas.loss import fused_triplet_loss
    from peppa_tpu.ops.similarity import cosine_matrix

    import functools
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((b, 512)), dtype)
    a = jnp.asarray(rng.standard_normal((b, 512)), dtype)

    pl_fn = jax.jit(jax.value_and_grad(
        functools.partial(fused_triplet_loss, margin=0.2,
                          interpret=interpret), argnums=(0, 1)))
    ref_fn = jax.jit(jax.value_and_grad(
        lambda v, a: contrastive(
            cosine_matrix(v.astype(jnp.float32), a.astype(jnp.float32)), 0.2),
        argnums=(0, 1)))
    l_pl, (gv_pl, ga_pl) = jax.tree.map(np.asarray, pl_fn(v, a))
    l_ref, (gv_ref, ga_ref) = jax.tree.map(np.asarray, ref_fn(v, a))
    return {"loss": _maxd(l_pl, l_ref),
            "dv": _maxd(gv_pl, gv_ref),
            "da": _maxd(ga_pl, ga_ref)}


def main():
    platform = jax.devices()[0].platform
    interpret = platform not in ("tpu", "axon")
    print(f"platform: {platform} (interpret={interpret})")
    print("\n| Kernel | dtype | masked | out/loss | grads |")
    print("|---|---|---|---|---|")
    for dtype in (jnp.float32, jnp.bfloat16):
        for with_lengths in (False, True):
            d = attention_deltas(dtype, with_lengths, interpret)
            print(f"| mha_attention | {jnp.dtype(dtype).name} "
                  f"| {with_lengths} | {d['out']:.2e} "
                  f"| dq {d['dq']:.2e}, dk {d['dk']:.2e}, dv {d['dv']:.2e} |",
                  flush=True)
    for dtype in (jnp.float32, jnp.bfloat16):
        d = loss_deltas(dtype, interpret=interpret)
        print(f"| fused_triplet_loss | {jnp.dtype(dtype).name} | — "
              f"| {d['loss']:.2e} "
              f"| dv {d['dv']:.2e}, da {d['da']:.2e} |", flush=True)


if __name__ == "__main__":
    main()
