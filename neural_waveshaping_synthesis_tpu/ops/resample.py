"""Polyphase Kaiser-windowed sinc resampling as framing + one matmul.

Replaces resampy's band-limited sinc resampler
(reference ``data/utils/preprocess_audio.py:65-66``). TPU-first
formulation: for a rational ratio up/down, group output samples by
``n mod up``. Within class r, successive outputs read input windows
hopped by exactly ``down`` samples, with a class-specific sub-window
offset. So the whole resample is:

    frames = frame_signal(x, taps_per_phase + down, hop=down)   # strided slices
    Y      = frames @ W.T        # (M, up) on the MXU
    y      = Y.reshape(M * up)[:out_len]

where row r of W embeds the class's polyphase filter at its offset.
No big gathers: an earlier gather-per-output-sample formulation took
XLA ~8 minutes to compile for 44.1k->16k; this compiles in seconds and
runs at memory speed.

The prototype low-pass is a Kaiser-windowed sinc at cutoff
min(1/up, 1/down) of the upsampled Nyquist (host-side, cached).
"""
import math
from fractions import Fraction
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .stft import frame_signal


@lru_cache(maxsize=None)
def _design(up: int, down: int, num_zeros: int, beta: float):
    """-> (W (up, window_len), pad_left, window_len).

    W[r] is the filter for output class ``n ≡ r (mod up)``, positioned at
    the class's input offset within the shared frame window.
    """
    cutoff = min(1.0 / up, 1.0 / down)
    half_len = int(math.ceil(num_zeros / cutoff))
    n = np.arange(-half_len, half_len + 1, dtype=np.float64)
    taps = cutoff * np.sinc(cutoff * n) * np.kaiser(len(n), beta) * up
    n_taps = len(taps)

    # y[n] = sum_j taps[n*down + half_len - j*up] * x[j]
    # class r (n = r + m*up): tap index = (r*down + half_len) - (j - m*down)*up
    # valid j span: j - m*down in [ceil((r*down + half_len - (n_taps-1))/up),
    #                              floor((r*down + half_len)/up)]
    taps_per_phase = -(-n_taps // up)
    # global window: input offsets j - m*down across all classes
    lo = min(
        -(-(r * down + half_len - (n_taps - 1)) // up) for r in range(up)
    )
    hi = max((r * down + half_len) // up for r in range(up))
    window_len = hi - lo + 1
    pad_left = -lo if lo < 0 else 0

    w = np.zeros((up, window_len), dtype=np.float64)
    for r in range(up):
        base = r * down + half_len
        j_lo = -(-(base - (n_taps - 1)) // up)
        j_hi = base // up
        for j in range(j_lo, j_hi + 1):
            w[r, j - lo] = taps[base - j * up]
    return jnp.asarray(w, jnp.float32), lo, window_len


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

    w, lo, window_len = _design(up, down, num_zeros, beta)
    t = audio.shape[-1]
    out_len = int(t * target_sr / original_sr)
    m = -(-out_len // up)  # frames needed

    pad_left = max(0, -lo)
    # frame m windows hopped by down: needs (m-1)*down + window_len samples
    # starting at input index lo
    needed = (m - 1) * down + window_len
    pad_right = max(0, needed + lo - t) + down
    x = jnp.pad(
        audio.astype(jnp.float32),
        [(0, 0)] * (audio.ndim - 1) + [(pad_left, pad_right)],
    )
    start = lo + pad_left  # always >= 0
    x = x[..., start:]
    frames = frame_signal(x, window_len, down)[..., :m, :]
    y = jnp.einsum(
        "...mw,rw->...mr", frames, w, preferred_element_type=jnp.float32
    )
    y = y.reshape(y.shape[:-2] + (m * up,))
    return y[..., :out_len]
