"""Length bucketing for jitted feature extraction.

Real corpora have arbitrary file lengths; XLA compiles one program per
input shape. Every extractor here zero-pads its input up to a bucket
quantum, runs ONE jitted program per bucket size, and trims the output
back to the true frame count — so a whole corpus compiles a handful of
programs instead of one per file.

Zero padding is semantically safe for these extractors:
  * loudness/MFCC reference their dB floor to the spectrogram max —
    zeros never raise the max, and padded frames are trimmed;
  * YIN frames beyond the true length are trimmed;
  * the resampler's appended zeros only produce trailing zeros.
"""
from typing import Tuple

import numpy as np

# ~2 s at 16 kHz; coarse enough to keep program count low, fine enough
# to bound wasted compute at < 2 s of audio per file.
DEFAULT_QUANTUM = 32768


def pad_to_quantum(
    x: np.ndarray, quantum: int = DEFAULT_QUANTUM
) -> Tuple[np.ndarray, int]:
    """Zero-pad the last axis up to a multiple of ``quantum``.

    Returns (padded, original_length)."""
    t = x.shape[-1]
    pad = (-t) % quantum
    if pad == 0:
        return x, t
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return np.pad(x, widths), t
