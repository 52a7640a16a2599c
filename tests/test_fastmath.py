"""Polynomial sine/cosine accuracy and gradient contracts
(ops/fastmath.py — the shaper/oscillator hot-path activation)."""
import numpy as np

import jax
import jax.numpy as jnp

from neural_waveshaping_synthesis_tpu.ops.fastmath import fast_cos, fast_sin


def test_fast_sin_accuracy_over_argument_ranges(rng):
    """Documented error bounds: ~1e-6 for shaper-scale args, ~2e-4 at
    the oscillator's wrapped-phase bound (tau * n_harmonics)."""
    for scale, bound in [(3.0, 2e-6), (50.0, 3e-5), (634.0, 5e-4)]:
        x = jnp.asarray((rng.standard_normal(200_000) * scale).astype(np.float32))
        err = np.abs(np.asarray(fast_sin(x)) - np.sin(np.asarray(x, np.float64)))
        assert err.max() < bound, (scale, err.max())


def test_fast_cos_accuracy(rng):
    x = jnp.asarray((rng.standard_normal(200_000) * 10.0).astype(np.float32))
    err = np.abs(np.asarray(fast_cos(x)) - np.cos(np.asarray(x, np.float64)))
    assert err.max() < 1e-5, err.max()


def test_fast_sin_polynomial_core_precision():
    """On the post-reduction interval the fit error (1.2e-9 in f64) is
    below f32 input-quantization noise, so f32 evaluation is exact to
    ~eps against the true sine of the represented argument."""
    x32 = np.linspace(-np.pi, np.pi, 100_001).astype(np.float32)
    err = np.abs(np.asarray(fast_sin(jnp.asarray(x32)))
                 - np.sin(x32.astype(np.float64)))
    assert err.max() < 5e-7, err.max()


def test_fast_sin_gradient_is_fast_cos(rng):
    x = jnp.asarray((rng.standard_normal(1000) * 5.0).astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(fast_sin(v)))(x)
    np.testing.assert_allclose(np.asarray(g), np.cos(np.asarray(x)),
                               atol=1e-5)
    g2 = jax.grad(lambda v: jnp.sum(fast_cos(v)))(x)
    np.testing.assert_allclose(np.asarray(g2), -np.sin(np.asarray(x)),
                               atol=1e-5)


def test_fast_sin_periodicity_and_symmetry():
    x = jnp.asarray(np.linspace(0, np.pi, 1001, dtype=np.float32))
    tau = np.float32(2 * np.pi)
    np.testing.assert_allclose(np.asarray(fast_sin(x + 4 * tau)),
                               np.asarray(fast_sin(x)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fast_sin(-x)),
                               -np.asarray(fast_sin(x)), atol=1e-7)


def test_fast_sin_under_jit_scan(rng):
    """Usable inside jitted scans (the streaming/training hot path)."""
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))

    @jax.jit
    def run(x):
        def body(c, _):
            return c + fast_sin(x).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=3)
        return acc

    expected = 3 * np.sin(np.asarray(x)).sum()
    assert abs(float(run(x)) - expected) < 1e-2


def test_shaper_sine_activation_matches_exact(rng):
    """The shipped 'sine' activation (fast_sin) stays within golden
    noise of 'sine_exact' through a full TrainableNonlinearity."""
    from neural_waveshaping_synthesis_tpu.models.modules import (
        TrainableNonlinearity,
    )

    fast = TrainableNonlinearity(channels=8, width=8, depth=4)
    exact = TrainableNonlinearity(channels=8, width=8, depth=4,
                                  nonlinearity="sine_exact",
                                  final_nonlinearity="sine_exact")
    p = fast.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 128, 8)).astype(np.float32))
    a, b = np.asarray(fast.apply(p, x)), np.asarray(exact.apply(p, x))
    nrms = np.sqrt(((a - b) ** 2).mean()) / (b.std() + 1e-12)
    assert nrms < 1e-4, nrms
