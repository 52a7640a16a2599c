"""Per-file preprocessing: wav -> float32 mono 16 kHz -> features ->
confidence-filtered 4 s segments.

Reference: ``data/utils/preprocess_audio.py:16-237``. Behavior parity:
  * int wavs scale by the dtype max; stereo collapses by keep_left
    (or keep_right / sum / diff);
  * optional corpus-max normalization (two-pass);
  * resampling to 16 kHz (ops/resample.py Kaiser-sinc XLA conv replaces
    resampy);
  * F0 + confidence, loudness, MFCC at the 125 Hz control rate;
  * segmentation into windows of ``segment_length_in_seconds`` hopped by
    ``hop_length_in_seconds`` (frames on the LAST axis, the reference's
    librosa.util.frame orientation);
  * drop segments whose mean confidence <= threshold.
"""
from functools import partial
from typing import Callable, Optional, Sequence, Union

import numpy as np
from scipy.io import wavfile

from ... import minigin as gin
from .f0_extraction import extract_f0_with_crepe, extract_f0_with_yin
from .loudness_extraction import extract_perceptual_loudness
from .mfcc_extraction import extract_mfcc


def read_audio_file(path: str):
    sr, audio = wavfile.read(path)
    return sr, audio


def convert_to_float32_audio(audio: np.ndarray) -> np.ndarray:
    if audio.dtype == np.float32:
        return audio
    if audio.dtype == np.float64:
        return audio.astype(np.float32)
    max_value = np.iinfo(audio.dtype).max
    return (audio / max_value).astype(np.float32)


def make_monophonic(audio: np.ndarray, strategy: str = "keep_left") -> np.ndarray:
    if audio.ndim == 1:
        return audio
    if audio.ndim != 2:
        raise ValueError("Unknown audio array format.")
    if audio.shape[0] == 1:
        return audio[0]
    if audio.shape[1] == 1:
        return audio[:, 0]
    if audio.shape[0] != 2 and audio.shape[1] != 2:
        raise ValueError("Expected stereo input audio but got too many channels.")
    if audio.shape[1] == 2:
        audio = audio.T
    if strategy == "keep_left":
        return audio[0]
    if strategy == "keep_right":
        return audio[1]
    if strategy == "sum":
        return np.mean(audio, axis=0)
    if strategy == "diff":
        return audio[0] - audio[1]
    raise ValueError(f"unknown strategy {strategy!r}")


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


def filter_segments(
    threshold: float, key_segments: np.ndarray, segments: Sequence[np.ndarray]
):
    """Keep segments whose mean key (confidence) exceeds threshold.

    key_segments: (seg_len, n); 2-D streams filter on axis 1, 3-D (mfcc)
    on axis 2 — the reference's orientation (preprocess_audio.py:83-93).
    """
    mask = key_segments.mean(axis=0) > threshold
    return [x[:, mask] if x.ndim == 2 else x[:, :, mask] for x in segments]


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
    if verbose:
        print(f"[preprocess] {file}")
    original_sr, audio = read_audio_file(file)
    audio = make_monophonic(convert_to_float32_audio(audio))
    if normalisation_factor:
        audio = audio / normalisation_factor
    if original_sr != target_sr:
        audio = resample_audio(audio, original_sr, target_sr)

    f0, confidence = f0_extractor(audio)
    loudness = loudness_extractor(audio)
    mfcc = mfcc_extractor(audio)

    control_sr = target_sr / (control_decimation_factor or 1)
    seg_audio = segment_signal(
        audio, target_sr, segment_length_in_seconds, hop_length_in_seconds
    )
    seg_f0 = segment_signal(
        f0, control_sr, segment_length_in_seconds, hop_length_in_seconds
    )
    seg_conf = segment_signal(
        confidence, control_sr, segment_length_in_seconds, hop_length_in_seconds
    )
    seg_loud = segment_signal(
        loudness, control_sr, segment_length_in_seconds, hop_length_in_seconds
    )
    seg_mfcc = segment_signal(
        mfcc, control_sr, segment_length_in_seconds, hop_length_in_seconds
    )

    filtered = filter_segments(
        confidence_threshold,
        seg_conf,
        (seg_audio, seg_f0, seg_conf, seg_loud, seg_mfcc),
    )
    if filtered[0].shape[-1] == 0:
        if verbose:
            print("[preprocess]   no segments above confidence threshold")
        return [], [], [], [], []

    def split(x):
        return [e.squeeze(-1) for e in np.split(x, x.shape[-1], -1)]

    return tuple(split(x) for x in filtered)


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
    """Generator yielding per-file (audio, f0, confidence, loudness, mfcc)
    segment lists. Pass 1 (optional) finds the corpus peak for
    normalization (reference preprocess_audio.py:214-224)."""
    normalisation_factor = None
    if normalise_audio:
        peak = 0.0
        for file in files:
            _, audio = read_audio_file(file)
            audio = make_monophonic(convert_to_float32_audio(audio))
            peak = max(peak, float(np.abs(audio).max()))
        normalisation_factor = peak
        if verbose:
            print(f"[preprocess] corpus normalisation factor: {peak:.4f}")

    processor = partial(
        preprocess_single_audio_file,
        control_decimation_factor=control_decimation_factor,
        target_sr=target_sr,
        segment_length_in_seconds=segment_length_in_seconds,
        hop_length_in_seconds=hop_length_in_seconds,
        confidence_threshold=confidence_threshold,
        f0_extractor=f0_extractor,
        loudness_extractor=loudness_extractor,
        normalisation_factor=normalisation_factor,
        verbose=verbose,
    )
    for file in files:
        yield processor(file)
