"""Frame-rate -> sample-rate interpolators (host-side, numpy).

Parity with reference ``data/utils/upsampling.py:20-79``. The shipped
configs set ``interpolation = None`` so these are dormant in the main
path, but they remain gin-selectable as ``interpolate_fn`` for
configurations that store sample-rate control signals.
"""
from typing import Optional

import numpy as np
import scipy.interpolate
import scipy.signal.windows

from ... import minigin as gin


def get_padded_length(frames: int, window_length: int, hop_length: int) -> int:
    return frames * hop_length + window_length - hop_length


def _axes(frames: int, window_length: int, hop_length: int):
    padded = get_padded_length(frames, window_length, hop_length)
    return np.linspace(0, frames - 1, frames), np.linspace(0, frames - 1, padded)


def _crop(x: np.ndarray, window_length: int, original_length: Optional[int]):
    if original_length:
        x = x[window_length // 2 :][:original_length]
    return x


@gin.configurable
def linear_interpolation(
    signal: np.ndarray,
    window_length: int,
    hop_length: int,
    original_length: Optional[int] = None,
) -> np.ndarray:
    source_x, target_x = _axes(signal.size, window_length, hop_length)
    return _crop(np.interp(target_x, source_x, signal), window_length, original_length)


@gin.configurable
def cubic_spline_interpolation(
    signal: np.ndarray,
    window_length: int,
    hop_length: int,
    original_length: Optional[int] = None,
) -> np.ndarray:
    source_x, target_x = _axes(signal.size, window_length, hop_length)
    interpolant = scipy.interpolate.interp1d(source_x, signal, kind="cubic")
    return _crop(interpolant(target_x), window_length, original_length)


@gin.configurable
def overlap_add_upsample(
    signal: np.ndarray,
    window_length: int,
    hop_length: int,
    window_fn: str = "hann",
    window_scale: int = 2,
    original_length: Optional[int] = None,
) -> np.ndarray:
    """Windowed OLA upsampling: each frame value becomes a grain."""
    window = scipy.signal.windows.get_window(window_fn, hop_length * window_scale)
    padded_length = get_padded_length(signal.size, window_length, hop_length)
    out = np.zeros(padded_length)
    for i, value in enumerate(signal):
        start = i * hop_length
        out[start : start + hop_length * window_scale] += window * value
    if original_length:
        out = out[(padded_length - original_length) // 2 :][:original_length]
    return out
