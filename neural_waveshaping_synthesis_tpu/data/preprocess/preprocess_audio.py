"""Per-file preprocessing: wav -> mono float32 16 kHz -> control
features -> confidence-filtered segment stacks.

Behavioral contract with the reference preprocessor
(``data/utils/preprocess_audio.py:16-237``), pinned by
``tests/test_preprocess.py``:
  * integer PCM scales to [-1, 1] by the dtype's positive max;
  * stereo collapses by keep_left / keep_right / sum (mean) / diff;
  * whichever 2-long axis exists is the channel axis, wider is an error;
  * optional corpus-peak normalization is a separate first pass over
    the raw (pre-resample) audio;
  * f0+confidence, loudness and MFCC live on the 125 Hz control grid
    (``target_sr / control_decimation_factor``);
  * windows of ``segment_length_in_seconds`` hopped by
    ``hop_length_in_seconds``; a segment survives iff its mean
    confidence exceeds the threshold.

TPU-first differences: the resampler is a jitted, length-bucketed
Kaiser-sinc conv (``ops/resample.py``) instead of resampy; segmentation
is strided index math instead of librosa.util.frame; per-file results
are stacked ``(n_segments, ...)`` arrays rather than lists of views.
"""
from functools import partial
from typing import Callable, Optional, Tuple

import numpy as np
from scipy.io import wavfile

from ... import minigin as gin
from .f0_extraction import extract_f0_with_crepe, extract_f0_with_yin
from .loudness_extraction import extract_perceptual_loudness
from .mfcc_extraction import extract_mfcc


# -- audio loading -----------------------------------------------------------

def convert_to_float32_audio(audio: np.ndarray) -> np.ndarray:
    """PCM int -> [-1, 1] float32 by the dtype's positive max; float
    input passes through (down-cast if f64)."""
    if np.issubdtype(audio.dtype, np.floating):
        return audio.astype(np.float32, copy=False)
    return audio.astype(np.float32) / np.iinfo(audio.dtype).max


_DOWNMIX = {
    "keep_left": lambda ch: ch[0],
    "keep_right": lambda ch: ch[1],
    "sum": lambda ch: ch.mean(axis=0),
    "diff": lambda ch: ch[0] - ch[1],
}


def make_monophonic(audio: np.ndarray, strategy: str = "keep_left") -> np.ndarray:
    """Collapse mono/stereo audio in any orientation to a 1-D array."""
    if audio.ndim == 1:
        return audio
    if audio.ndim != 2:
        raise ValueError(f"audio must be 1-D or 2-D, got shape {audio.shape}")
    if 1 in audio.shape:  # single channel stored 2-D, either orientation
        return audio.reshape(-1)
    if audio.shape[1] == 2:  # time-major stereo -> channel-major
        audio = audio.T
    if audio.shape[0] != 2:
        raise ValueError(
            f"expected mono or stereo audio, got {min(audio.shape)} channels"
        )
    try:
        return _DOWNMIX[strategy](audio)
    except KeyError:
        raise ValueError(f"unknown downmix strategy {strategy!r}") from None


def load_mono_audio(path: str, strategy: str = "keep_left") -> Tuple[int, np.ndarray]:
    """wav file -> (native sample rate, mono float32 signal)."""
    sr, raw = wavfile.read(path)
    return sr, make_monophonic(convert_to_float32_audio(raw), strategy)


# -- resampling --------------------------------------------------------------

_RESAMPLE_JIT = {}


def resample_audio(
    audio: np.ndarray, original_sr: float, target_sr: float
) -> np.ndarray:
    """Jitted, length-bucketed resampling (one compiled program per
    (rate pair, bucket) instead of one per file length)."""
    from fractions import Fraction

    import jax
    import jax.numpy as jnp

    from ...ops.resample import resample_kaiser

    key = (original_sr, target_sr)
    if key not in _RESAMPLE_JIT:
        _RESAMPLE_JIT[key] = jax.jit(
            partial(resample_kaiser, original_sr=original_sr, target_sr=target_sr)
        )
    frac = Fraction(int(round(target_sr)), int(round(original_sr)))
    # quantum: a multiple of `down` (integral output length) near 1 s
    down = frac.denominator
    quantum = down * max(1, int(round(original_sr / down)))
    t = audio.shape[-1]
    pad = (-t) % quantum
    out_true = int(t * target_sr / original_sr)
    padded = np.pad(audio, (0, pad)) if pad else audio
    out = np.asarray(_RESAMPLE_JIT[key](jnp.asarray(padded, jnp.float32)))
    return out[..., :out_true]


# -- segmentation ------------------------------------------------------------

def segment_signal(
    signal: np.ndarray,
    sample_rate: float,
    segment_length_in_seconds: float,
    hop_length_in_seconds: float,
) -> np.ndarray:
    """Frame along the last axis -> (..., segment_len, n_segments)."""
    seg = int(sample_rate * segment_length_in_seconds)
    hop = int(sample_rate * hop_length_in_seconds)
    t = signal.shape[-1]
    n = 1 + (t - seg) // hop if t >= seg else 0
    if n <= 0:
        return np.zeros(signal.shape[:-1] + (seg, 0), signal.dtype)
    idx = np.arange(seg)[:, None] + hop * np.arange(n)[None, :]
    return signal[..., idx]


def filter_segments(threshold: float, key_segments: np.ndarray, segments):
    """Keep segments whose mean key (confidence) exceeds threshold.

    key_segments: (seg_len, n); the segment axis is last, so 2-D streams
    mask on axis 1 and 3-D (mfcc) on axis 2.
    """
    mask = key_segments.mean(axis=0) > threshold
    return [x[..., mask] for x in segments]


# -- per-file pipeline -------------------------------------------------------

def preprocess_single_audio_file(
    file: str,
    control_decimation_factor: float,
    target_sr: float = 16000.0,
    segment_length_in_seconds: float = 4.0,
    hop_length_in_seconds: float = 2.0,
    confidence_threshold: float = 0.85,
    f0_extractor: Callable = extract_f0_with_crepe,
    loudness_extractor: Callable = extract_perceptual_loudness,
    mfcc_extractor: Callable = extract_mfcc,
    normalisation_factor: Optional[float] = None,
    verbose: bool = True,
):
    """One wav -> (audio, f0, confidence, loudness, mfcc) segment stacks.

    Each return value is stacked on a LEADING segment axis: audio
    (n, seg_samples), control streams (n, seg_frames), mfcc
    (n, 16, seg_frames); n may be 0 when every window fails the
    confidence filter.
    """
    if verbose:
        print(f"[preprocess] {file}")
    sr, audio = load_mono_audio(file)
    if normalisation_factor:
        audio = audio / normalisation_factor
    if sr != target_sr:
        audio = resample_audio(audio, sr, target_sr)

    f0, confidence = f0_extractor(audio)
    control_sr = target_sr / (control_decimation_factor or 1)

    # (signal, rate) in the output order of the 5-tuple
    streams = (
        (audio, target_sr),
        (f0, control_sr),
        (confidence, control_sr),
        (loudness_extractor(audio), control_sr),
        (mfcc_extractor(audio), control_sr),
    )
    windows = [
        segment_signal(x, rate, segment_length_in_seconds, hop_length_in_seconds)
        for x, rate in streams
    ]
    conf_windows = windows[2]
    keep = conf_windows.mean(axis=0) > confidence_threshold
    if verbose and not keep.any():
        print("[preprocess]   no segments above confidence threshold")
    # trailing segment axis -> leading, filtered
    return tuple(np.moveaxis(w[..., keep], -1, 0) for w in windows)


def _corpus_peak(files, verbose: bool) -> float:
    """Max |sample| over the raw mono corpus (normalise_audio pass 1)."""
    peak = 0.0
    for file in files:
        _, audio = load_mono_audio(file)
        peak = max(peak, float(np.abs(audio).max()))
    if verbose:
        print(f"[preprocess] corpus peak over {len(files)} files: {peak:.4f}")
    return peak


@gin.configurable
def preprocess_audio(
    files: list,
    control_decimation_factor: float = 128,
    target_sr: float = 16000,
    segment_length_in_seconds: float = 4.0,
    hop_length_in_seconds: float = 2.0,
    confidence_threshold: float = 0.85,
    f0_extractor: Callable = extract_f0_with_crepe,
    loudness_extractor: Callable = extract_perceptual_loudness,
    normalise_audio: bool = False,
    verbose: bool = True,
):
    """Generator of per-file segment stacks (see
    ``preprocess_single_audio_file`` for the per-item layout)."""
    norm = _corpus_peak(files, verbose) if normalise_audio else None
    for file in files:
        yield preprocess_single_audio_file(
            file,
            control_decimation_factor=control_decimation_factor,
            target_sr=target_sr,
            segment_length_in_seconds=segment_length_in_seconds,
            hop_length_in_seconds=hop_length_in_seconds,
            confidence_threshold=confidence_threshold,
            f0_extractor=f0_extractor,
            loudness_extractor=loudness_extractor,
            normalisation_factor=norm,
            verbose=verbose,
        )
