"""Polyphase Kaiser-windowed sinc resampling as an XLA convolution.

Replaces resampy's band-limited sinc resampler
(reference ``data/utils/preprocess_audio.py:65-66``) with a rational
polyphase design: zero-stuff by L, FIR low-pass, decimate by M —
expressed as a single ``lax.conv_general_dilated`` with lhs_dilation=L
and stride=M, which XLA maps onto the TPU conv units. The FIR is a
Kaiser-windowed sinc designed host-side (static for a given rate pair).
"""
import math
from fractions import Fraction
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _design_filter(up: int, down: int, num_zeros: int, beta: float) -> np.ndarray:
    """Kaiser-windowed sinc low-pass at cutoff min(1/up, 1/down),
    scaled by `up` to preserve amplitude through zero-stuffing."""
    cutoff = min(1.0 / up, 1.0 / down)  # in units of Nyquist of the upsampled rate
    half_len = int(math.ceil(num_zeros / cutoff))
    n = np.arange(-half_len, half_len + 1, dtype=np.float64)
    taps = cutoff * np.sinc(cutoff * n)
    taps *= np.kaiser(len(n), beta)
    taps *= up
    return taps.astype(np.float32)


def resample_kaiser(
    audio: jnp.ndarray,
    original_sr: float,
    target_sr: float,
    num_zeros: int = 32,
    beta: float = 14.0,
) -> jnp.ndarray:
    """Resample ``(..., T)`` audio from original_sr to target_sr.

    Output length floor(T * target/original), matching resampy.
    """
    if original_sr == target_sr:
        return audio
    frac = Fraction(int(round(target_sr)), int(round(original_sr)))
    up, down = frac.numerator, frac.denominator

    taps = _design_filter(up, down, num_zeros, beta)
    n_taps = len(taps)
    t = audio.shape[-1]
    out_len = int(t * target_sr / original_sr)

    batch_shape = audio.shape[:-1]
    x = audio.reshape((-1, 1, t)).astype(jnp.float32)  # (N, C=1, T)
    k = jnp.asarray(taps).reshape((1, 1, n_taps))

    # Causal alignment: the filter is centered (group delay (n_taps-1)/2
    # at the upsampled rate); pad so output sample i corresponds to
    # input time i*down/up.
    half = (n_taps - 1) // 2
    y = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(down,),
        padding=[(half, half + down * out_len)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    y = y[..., 0, :out_len]
    return y.reshape(batch_shape + (out_len,))
