"""Exact-GELU (erf form) with a bf16-precision polynomial fast path.

The reference uses torch's default nn.GELU, i.e. x * Phi(x) with the exact
(erf) CDF (pig/models.py wav2vec2 + torchaudio internals).  On TPU the erf
lowering is a long transcendental chain on the VPU, and this model applies
GELU to ~660M activations per batch in the wav2vec2 conv extractor alone —
measured transcendental-bound at ~6.6e10 elem/s (scripts/perf_probe.py
layer_parts: 0.52 ms for one (32,317,3072) tensor), i.e. ~10 ms of a ~100 ms
forward is erf.

`gelu` therefore dispatches on dtype:
- float32/float64 inputs: jax.nn.gelu(approximate=False) — the exact erf
  path (used by all parity/import tests and f32 models).
- bfloat16 inputs: a degree-7-in-x^2 polynomial for Phi evaluated in f32.
  EXHAUSTIVELY verified over the entire finite-bf16 domain (all 65280
  values, tests/test_gelu.py): 99.51% of inputs produce BIT-IDENTICAL bf16
  outputs to the f32-erf reference; the remaining 0.49% differ by at most
  4.8e-4 absolutely, all at |x| in [3.8, 4.5] where gelu(x) itself is
  ~1e-4.  In bf16 arithmetic this IS the erf GELU; no quality knob needed.

Set PEPPA_EXACT_GELU=1 to force the erf path everywhere (A/B debugging).

Kernel shape: u = min(x^2, 20.25); Phi = clip(0.5 + x*P(u), 0, 1);
gelu = x*Phi.  The u-clamp + Phi-clip make both tails exact: x >= 4.5 gives
Phi = 1 (gelu = x), x <= -4.5 gives Phi = 0 (gelu = 0, |error| <= 1.6e-5).
Pure FMA/select — no transcendentals.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# minimax-ish (x^2-weighted least squares) coefficients for
# (Phi(x) - 0.5)/x as a polynomial in u = x^2, fitted on |x| <= 4.5
# (scripts/fit_gelu_poly.py reproduces them)
_PHI_COEFFS = (
    3.9813697629e-01,
    -6.5037173229e-02,
    9.0505252190e-03,
    -8.9168849013e-04,
    5.9422497875e-05,
    -2.5208075924e-06,
    6.0943221476e-08,
    -6.3568715724e-10,
)
_U_MAX = 20.25  # 4.5^2


def gelu_poly_f32(xf: jnp.ndarray) -> jnp.ndarray:
    """The polynomial GELU evaluated in float32 (input must be f32)."""
    u = jnp.minimum(xf * xf, _U_MAX)
    p = jnp.float32(_PHI_COEFFS[-1])
    for c in _PHI_COEFFS[-2::-1]:
        p = p * u + jnp.float32(c)
    phi = jnp.clip(jnp.float32(0.5) + xf * p, 0.0, 1.0)
    return xf * phi


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU; bf16 inputs take the bf16-exact polynomial path."""
    if x.dtype == jnp.bfloat16 and not os.environ.get("PEPPA_EXACT_GELU"):
        return gelu_poly_f32(x.astype(jnp.float32)).astype(jnp.bfloat16)
    return jax.nn.gelu(x, approximate=False)
