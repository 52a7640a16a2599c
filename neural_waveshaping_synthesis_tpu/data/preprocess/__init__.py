"""Offline preprocessing: wav -> features -> segments -> .npy shards.

TPU-rebuild of ``data/utils/`` (reference): the feature extractors are
jitted XLA programs (CREPE/YIN f0, loudness, MFCC batch whole files on
device); segmentation/filtering/normalization and split logic are
host-side numpy, shard-format-identical to the reference so datasets
interchange.
"""
from .f0_extraction import (
    extract_f0_with_crepe,
    extract_f0_with_pyin,
    extract_f0_with_yin,
)
from .loudness_extraction import extract_perceptual_loudness, extract_rms
from .mfcc_extraction import extract_mfcc
from .preprocess_audio import (
    convert_to_float32_audio,
    make_monophonic,
    preprocess_audio,
    preprocess_single_audio_file,
    segment_signal,
    filter_segments,
)
from .create_dataset import create_dataset
from .upsampling import (
    linear_interpolation,
    cubic_spline_interpolation,
    overlap_add_upsample,
)

__all__ = [
    "extract_f0_with_crepe",
    "extract_f0_with_pyin",
    "extract_f0_with_yin",
    "extract_perceptual_loudness",
    "extract_rms",
    "extract_mfcc",
    "convert_to_float32_audio",
    "make_monophonic",
    "preprocess_audio",
    "preprocess_single_audio_file",
    "segment_signal",
    "filter_segments",
    "create_dataset",
    "linear_interpolation",
    "cubic_spline_interpolation",
    "overlap_add_upsample",
]
