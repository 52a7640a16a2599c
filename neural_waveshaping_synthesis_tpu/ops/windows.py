"""Window functions.

``hann_window(n, periodic=True)`` matches ``torch.hann_window`` defaults
(used by the reference's FIRNoiseSynth window buffer,
reference ``models/modules/generators.py:18``, and by the
multi-resolution STFT loss).
"""
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, periodic: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """Hann window. ``periodic=True`` == torch.hann_window default."""
    if n == 1:
        return jnp.ones((1,), dtype=dtype)
    denom = n if periodic else n - 1
    k = jnp.arange(n, dtype=jnp.float32)
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * k / denom)
    return w.astype(dtype)


def kaiser_window(n: int, beta: float, dtype=jnp.float32) -> jnp.ndarray:
    """Symmetric Kaiser window (host-computed; used for resampler design)."""
    w = np.kaiser(n, beta)
    return jnp.asarray(w, dtype=dtype)
