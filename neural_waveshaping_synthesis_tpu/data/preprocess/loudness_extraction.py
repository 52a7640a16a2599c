"""Loudness extraction wrappers (reference ``data/utils/loudness_extraction.py``).

The compute lives in ``ops/loudness.py`` (jitted). The reference's
A-weighting quirk — the curve is computed but never added
(loudness_extraction.py:38: ``power_spectrogram_in_db  # + weights``) —
is preserved via ``apply_a_weighting=False`` default; flip the gin
binding for a corrected pipeline (documented capability upgrade).
"""
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ... import minigin as gin
from ...ops.loudness import extract_perceptual_loudness as _loudness_op
from ...ops.loudness import extract_rms as _rms_op
from .bucketing import pad_to_quantum

_loudness_jit = jax.jit(
    _loudness_op,
    static_argnames=(
        "sample_rate",
        "n_fft",
        "hop_length",
        "epsilon",
        "normalise",
        "apply_a_weighting",
    ),
)


@gin.configurable
def extract_perceptual_loudness(
    audio: np.ndarray,
    sample_rate: float = 16000,
    n_fft: int = 2048,
    hop_length: int = 512,
    epsilon: float = 1e-5,
    normalise: bool = True,
    apply_a_weighting: bool = False,
    interpolate_fn: Optional[Callable] = None,
) -> np.ndarray:
    padded, true_len = pad_to_quantum(np.asarray(audio, np.float32))
    n_frames = 1 + true_len // hop_length
    loudness = np.asarray(
        _loudness_jit(
            jnp.asarray(padded),
            sample_rate=sample_rate,
            n_fft=n_fft,
            hop_length=hop_length,
            epsilon=epsilon,
            normalise=normalise,
            apply_a_weighting=apply_a_weighting,
        )
    )[..., :n_frames]
    if interpolate_fn:
        loudness = interpolate_fn(
            loudness, n_fft, hop_length, original_length=audio.size
        )
    return loudness


@gin.configurable
def extract_rms(
    audio: np.ndarray,
    window_size: int = 2048,
    hop_length: int = 512,
    sample_rate: Optional[float] = 16000.0,
    interpolate_fn: Optional[Callable] = None,
) -> np.ndarray:
    root = np.asarray(_rms_op(jnp.asarray(audio, jnp.float32), window_size, hop_length))
    if interpolate_fn:
        root = interpolate_fn(root, window_size, hop_length, original_length=audio.size)
    return root
