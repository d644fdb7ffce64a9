"""Reproduce the polynomial-GELU coefficients in peppa_tpu/ops/gelu.py.

Fits (Phi(x) - 0.5)/x as a degree-7 polynomial in u = x^2 over |x| <= 4.5,
weighting rows by x^2 so the least-squares residual minimizes GELU error
(not Phi error) uniformly.  Prints the coefficients and the max |gelu_poly -
gelu_erf| over a dense grid; tests/test_gelu.py then verifies the shipped
coefficients exhaustively over the whole bf16 domain.
"""

from math import erf

import numpy as np

XMAX = 4.5
DEG = 7


def main() -> None:
    xs = np.linspace(1e-6, XMAX, 40001)
    gelu_t = np.array([x * 0.5 * (1 + erf(x / np.sqrt(2))) for x in xs])
    u = xs ** 2
    g = (gelu_t / xs - 0.5) / xs
    V = np.vander(u, DEG + 1, increasing=True)
    c, *_ = np.linalg.lstsq(V * u[:, None], g * u, rcond=None)

    xf = np.linspace(-XMAX, XMAX, 80001)
    uf = np.minimum(xf ** 2, XMAX ** 2)
    p = np.full_like(xf, c[-1])
    for k in range(DEG - 1, -1, -1):
        p = p * uf + c[k]
    phi = np.clip(0.5 + xf * p, 0.0, 1.0)
    gelu_p = xf * phi
    gelu_e = np.array([x * 0.5 * (1 + erf(x / np.sqrt(2))) for x in xf])
    err = np.abs(gelu_p - gelu_e)
    print("coeffs =", [f"{v:.10e}" for v in c])
    print(f"max |gelu_poly - gelu_erf| on [-{XMAX},{XMAX}]: {err.max():.2e} "
          f"at x={xf[err.argmax()]:.2f}")


if __name__ == "__main__":
    main()
