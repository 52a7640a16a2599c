"""Polynomial sine/cosine for the VPU-bound hot paths.

Why this exists (measured on the v5e chip, 2026-08-17, differential
scan timing, B=256 x 1024-sample buffers): the NEWT waveshaper bank is
SINE-bound, not matmul- or HBM-bound — one `jnp.sin` pass over the
(B·T, 512) activations costs 3.35 ms while all four of the bank's
matmul layers together cost 1.76 ms. XLA's `sin` lowering pays for
arbitrary-range argument reduction that these callers never need: the
shaper's activations are a few radians, and the oscillator wraps its
phase to [0, tau) before the harmonic expansion, bounding arguments by
tau * n_harmonics (~634).

`fast_sin` does one round-to-nearest period reduction and a degree-13
odd polynomial (Chebyshev-node least-squares fit, f64): **0.72 ms for
the same pass — 4.6x faster** — with max absolute error

  * 1.2e-9 against exact sin on [-pi, pi] (the polynomial itself);
  * 6.0e-7 for args ~ N(0, 3)   (shaper activations);
  * 1.1e-5 for args ~ N(0, 50);
  * 1.8e-4 for args ~ N(0, 600) (oscillator worst case — dominated by
    f32 rounding of the period subtraction; f32 *representation* of a
    600-rad phase already carries ~6e-5 rad of quantization, so exact
    sin is no more accurate in f32 there).

All bounds are ~100x inside the framework's end-to-end golden
tolerance (1e-3 normalized RMS vs the stock-torch oracle of the
reference checkpoint, tests/test_model_golden.py).

Gradients: `fast_sin`/`fast_cos` carry custom JVPs (d sin = cos,
d cos = -sin, both the fast variants), so the backward pass is equally
sine-bound-free. The period reduction is x - tau*round(x/tau) whose
derivative is 1 almost everywhere (round is piecewise constant), which
the custom JVP encodes by construction.

Exact-`jnp.sin` escape hatch: callers keep a switch (the shaper's
`nonlinearity="sine_exact"`, `oscillator.EXACT_SIN`) for A/B and for
any future platform where XLA's sin wins.
"""
import math

import jax
import jax.numpy as jnp

TAU = 2.0 * math.pi
_INV_TAU = 1.0 / TAU

# Chebyshev-node least-squares fits on [-pi, pi], f64 (see module
# docstring; regenerate with docs/DESIGN.md §3.2's snippet).
_SIN_ODD_COEFFS = (
    0.9999999944601012,
    -0.16666664569899559,
    0.008333310293322599,
    -0.0001984015186074305,
    2.7529394880216866e-06,
    -2.4676487473365142e-08,
    1.344997356671708e-10,
)
_COS_EVEN_COEFFS = (
    1.0000000001125011,
    -0.49999999861565086,
    0.041666663506715884,
    -0.0013888863097880472,
    2.4800554530106417e-05,
    -2.7534810390540134e-07,
    2.060362708310104e-09,
    -9.7225364605847e-12,
)


def _reduce(x: jnp.ndarray) -> jnp.ndarray:
    """Range-reduce to [-pi, pi] (one round + one fma)."""
    return x - TAU * jnp.round(x * _INV_TAU)


@jax.custom_jvp
def _fast_sin_poly(x: jnp.ndarray) -> jnp.ndarray:
    r = _reduce(x)
    s = r * r
    p = jnp.asarray(_SIN_ODD_COEFFS[-1], x.dtype)
    for c in _SIN_ODD_COEFFS[-2::-1]:
        p = p * s + c
    return r * p


@jax.custom_jvp
def _fast_cos_poly(x: jnp.ndarray) -> jnp.ndarray:
    r = _reduce(x)
    s = r * r
    p = jnp.asarray(_COS_EVEN_COEFFS[-1], x.dtype)
    for c in _COS_EVEN_COEFFS[-2::-1]:
        p = p * s + c
    return p


@_fast_sin_poly.defjvp
def _fast_sin_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return _fast_sin_poly(x), _fast_cos_poly(x) * t


@_fast_cos_poly.defjvp
def _fast_cos_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return _fast_cos_poly(x), -_fast_sin_poly(x) * t


def fast_sin(x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial sine (f32 and below); see module docstring.

    float64 inputs take exact ``jnp.sin``: the polynomial's 1.2e-9 fit
    error would dominate f64 precision, and — measured — XLA contracts
    the explicit Horner mul+adds into FMAs differently across compiled
    programs, which broke the f64 cross-mesh EXACT fit-equivalence
    contract (tests/test_training.py fit-level test; jnp.sin is one
    library call, bit-identical in every program)."""
    if jnp.result_type(x) == jnp.float64:
        return jnp.sin(x)
    return _fast_sin_poly(x)


def fast_cos(x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial cosine; f64 delegates to ``jnp.cos`` (see fast_sin)."""
    if jnp.result_type(x) == jnp.float64:
        return jnp.cos(x)
    return _fast_cos_poly(x)
