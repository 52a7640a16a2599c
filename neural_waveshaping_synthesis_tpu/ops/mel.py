"""Mel filterbank, DCT-II, and MFCC (librosa 0.8 parity, in JAX).

Replaces the reference's ``librosa.feature.mfcc`` call
(``data/utils/mfcc_extraction.py:6-13``; config: n_fft=1024, hop=128,
n_mfcc=16 per ``gin/data/urmp_4second_crepe.gin:16-19``). MFCCs are
stored as control channels 3-18 but never consumed by the model —
we keep them for dataset-format parity.

The filterbank is built host-side with numpy (static, tiny) and the
spectrogram->MFCC path is a jittable matmul chain that XLA maps onto
the MXU for whole-corpus batches.
"""
from functools import lru_cache
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .stft import stft as _stft
from .windows import hann_window


def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False default)."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = freq >= min_log_hz
    mels = np.where(
        log_t,
        min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: float,
    n_fft: int,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> jnp.ndarray:
    """Slaney-normalized triangular mel filterbank ``(n_mels, n_fft//2+1)``."""
    if fmax is None:
        fmax = sample_rate / 2.0
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    mel_f = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return jnp.asarray(weights, dtype=jnp.float32)


@lru_cache(maxsize=None)
def dct_ii(n_out: int, n_in: int) -> jnp.ndarray:
    """Orthonormal DCT-II matrix ``(n_out, n_in)`` (scipy.fft.dct norm='ortho')."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    basis *= np.sqrt(2.0 / n_in)
    basis[0] *= 1.0 / np.sqrt(2.0)
    return jnp.asarray(basis, dtype=jnp.float32)


def power_to_db(
    power: jnp.ndarray, amin: float = 1e-10, top_db: Optional[float] = 80.0
) -> jnp.ndarray:
    """librosa.power_to_db with ref=1.0."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(power, amin))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def mfcc(
    audio: jnp.ndarray,
    sample_rate: float = 16000,
    n_fft: int = 1024,
    hop_length: int = 128,
    n_mfcc: int = 16,
    n_mels: int = 128,
) -> jnp.ndarray:
    """MFCCs of ``(..., T)`` audio -> ``(..., n_mfcc, n_frames)``.

    Channel-first output (mfcc, frames) matches the reference's storage
    layout inside the 19-channel control array.
    """
    window = hann_window(n_fft, periodic=True)
    spec = _stft(audio, n_fft, hop_length, window=window, center=True)
    power = spec.real * spec.real + spec.imag * spec.imag  # (..., frames, bins)
    fb = mel_filterbank(sample_rate, n_fft, n_mels)  # (mels, bins)
    mel_power = jnp.einsum("...fb,mb->...fm", power, fb)
    mel_db = power_to_db(mel_power)
    coeffs = jnp.einsum("...fm,cm->...cf", mel_db, dct_ii(n_mfcc, n_mels))
    return coeffs
