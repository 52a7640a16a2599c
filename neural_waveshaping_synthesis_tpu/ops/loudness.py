"""Perceptual loudness extraction (librosa-parity, in JAX).

Replaces the reference's librosa-based extractor
(``data/utils/loudness_extraction.py:11-89``) with a jittable XLA
program so loudness for a whole corpus batches onto the TPU.

Parity notes (quirks preserved deliberately):
  * ``amplitude_to_db`` matches librosa: 20*log10(max(|S|, amin)) with
    ref=max over the WHOLE spectrogram and top_db=80 clipping.
  * The reference computes A-weighting but never applies it — line 38 of
    ``loudness_extraction.py`` reads ``power_spectrogram_in_db  # + weights``.
    We default ``apply_a_weighting=False`` to match the shipped
    checkpoints; flip it on for a corrected pipeline.
  * librosa centers the STFT with reflect padding and a symmetric-ish
    periodic hann of win_length=n_fft.
"""
from typing import Optional

import jax.numpy as jnp

from .stft import stft as _stft
from .windows import hann_window


def amplitude_to_db(
    magnitude: jnp.ndarray,
    amin: float = 1e-5,
    top_db: Optional[float] = 80.0,
    ref: str = "max",
) -> jnp.ndarray:
    """librosa.amplitude_to_db parity: power dB of an amplitude
    spectrogram, referenced to its max, floored at ref_db - top_db."""
    power = jnp.square(jnp.maximum(magnitude, 0.0))
    amin_p = amin * amin
    log_spec = 10.0 * jnp.log10(jnp.maximum(power, amin_p))
    if ref == "max":
        ref_p = jnp.maximum(power.max(), amin_p)
    else:
        ref_p = jnp.maximum(jnp.asarray(float(ref)) ** 2, amin_p)
    log_spec = log_spec - 10.0 * jnp.log10(ref_p)
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def a_weighting(frequencies: jnp.ndarray, min_db: float = -80.0) -> jnp.ndarray:
    """IEC 61672 A-weighting curve in dB (librosa.A_weighting parity)."""
    f_sq = jnp.square(frequencies)
    const = jnp.array([12194.217, 20.598997, 107.65265, 737.86223]) ** 2.0
    weights = 2.0 + 20.0 * (
        jnp.log10(const[0])
        + 2.0 * jnp.log10(jnp.maximum(f_sq, 1e-20))
        - jnp.log10(f_sq + const[0])
        - jnp.log10(f_sq + const[1])
        - 0.5 * jnp.log10(f_sq + const[2])
        - 0.5 * jnp.log10(f_sq + const[3])
    )
    return jnp.maximum(weights, min_db)


def extract_perceptual_loudness(
    audio: jnp.ndarray,
    sample_rate: float = 16000,
    n_fft: int = 1024,
    hop_length: int = 128,
    epsilon: float = 1e-5,
    normalise: bool = True,
    apply_a_weighting: bool = False,
) -> jnp.ndarray:
    """Frame-rate loudness of ``(..., T)`` audio -> ``(..., n_frames)``.

    n_frames = 1 + T // hop_length (centered STFT), i.e. 125 Hz control
    rate for the shipped config.
    """
    window = hann_window(n_fft, periodic=True)
    spec = _stft(audio, n_fft, hop_length, window=window, center=True)
    mag = jnp.abs(spec)  # (..., frames, bins)
    db = amplitude_to_db(mag, amin=epsilon, top_db=80.0, ref="max")
    if apply_a_weighting:
        freqs = jnp.fft.rfftfreq(n_fft, 1.0 / sample_rate)
        db = db + a_weighting(freqs)
    loudness = jnp.mean(db, axis=-1)  # mean over frequency bins
    if normalise:
        loudness = (loudness + 80.0) / 80.0
    return loudness


def extract_rms(
    audio: jnp.ndarray, window_size: int = 2048, hop_length: int = 512
) -> jnp.ndarray:
    """Centered frame RMS (reference loudness_extraction.py:71-89)."""
    pad = [(0, 0)] * (audio.ndim - 1) + [(window_size // 2, window_size // 2)]
    padded = jnp.pad(audio, pad)
    from .stft import frame_signal

    frames = frame_signal(padded, window_size, hop_length)
    return jnp.sqrt(jnp.mean(jnp.square(frames), axis=-1))
