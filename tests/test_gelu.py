"""Polynomial GELU (ops/gelu.py): exhaustive bf16-domain equivalence.

The bf16 fast path must be the erf GELU at bf16 precision: this test walks
EVERY finite bf16 value and compares the rounded outputs against the
float64-erf reference (reference semantics: torch nn.GELU default inside
torchaudio's wav2vec2, pig/models.py:66-109).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

import jax
import jax.numpy as jnp

from peppa_tpu.ops.gelu import gelu, gelu_poly_f32


def _all_finite_bf16() -> np.ndarray:
    import ml_dtypes

    bits = np.arange(1 << 16, dtype=np.uint16)
    x = bits.view(ml_dtypes.bfloat16).astype(np.float64)
    return x[np.isfinite(x)]


def _gelu_exact_f64(x: np.ndarray) -> np.ndarray:
    from math import erf

    return np.array([v * 0.5 * (1.0 + erf(v / np.sqrt(2))) for v in x])


def test_bf16_domain_exhaustive():
    import ml_dtypes

    x = _all_finite_bf16()
    exact = _gelu_exact_f64(x)
    got = np.asarray(jax.jit(gelu)(jnp.asarray(x, jnp.bfloat16)))
    want = exact.astype(np.float32).astype(ml_dtypes.bfloat16)
    got16 = got.astype(ml_dtypes.bfloat16) if got.dtype != ml_dtypes.bfloat16 \
        else got
    same = got16 == want
    # >= 98.5% of the entire bf16 domain is BIT-IDENTICAL to the erf path
    # (the exact fraction depends on the backend's FMA contraction)
    assert same.mean() >= 0.985, same.mean()
    # every disagreement on a NORMAL input (subnormals hit XLA's
    # flush-to-zero on either path) is within 1 bf16 ULP of the exact
    # value, or <= 5e-4 absolutely (the |x| in [3.8, 4.5] tail where
    # gelu itself is ~1e-4)
    d = ~same & (np.abs(x) >= 2.0 ** -126)
    wd = want.astype(np.float64)[d]
    diffs = np.abs(got16.astype(np.float64)[d] - wd)
    ulp = 2.0 ** (np.floor(np.log2(np.maximum(np.abs(wd), 2.0 ** -126))) - 7)
    assert np.all(diffs <= np.maximum(ulp * 1.01, 5e-4)), diffs.max()


def test_f32_path_is_exact_erf():
    x = np.linspace(-6, 6, 4001).astype(np.float32)
    got = np.asarray(gelu(jnp.asarray(x)))
    want = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
    np.testing.assert_array_equal(got, want)


def test_exact_env_override(monkeypatch):
    monkeypatch.setenv("PEPPA_EXACT_GELU", "1")
    x = jnp.asarray(np.linspace(-4, 4, 101), jnp.bfloat16)
    got = np.asarray(gelu(x), np.float32)
    want = np.asarray(jax.nn.gelu(x, approximate=False), np.float32)
    np.testing.assert_array_equal(got, want)


def test_poly_tails_and_specials():
    xf = jnp.asarray([1e4, -1e4, 0.0, np.inf, -np.inf], jnp.float32)
    out = np.asarray(gelu_poly_f32(xf))
    assert out[0] == 1e4          # Phi clamps to 1
    assert out[1] == 0.0          # Phi clamps to 0
    assert out[2] == 0.0
    assert out[3] == np.inf
    # -inf: -inf * clip(...)=0 -> nan, same as the erf path (-inf * 0)
    assert np.isnan(out[4])
    assert np.isnan(float(jax.nn.gelu(jnp.float32(-np.inf),
                                      approximate=False)))
    nan_out = np.asarray(gelu_poly_f32(jnp.asarray([np.nan], jnp.float32)))
    assert np.isnan(nan_out[0])
