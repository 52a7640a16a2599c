"""Pure-function DSP ops — the framework's compute vocabulary.

Everything here is shape-static, jit-friendly, and channels-last.
These functions replace the torch/librosa/auraloss primitives the
reference leans on (torch.stft/istft, F.upsample, torch.fft, librosa
STFT/mel/MFCC/loudness, resampy resampling) with TPU-native JAX.
"""
from .windows import hann_window, kaiser_window
from .upsample import linear_upsample, cubic_upsample, overlap_add_upsample
from .stft import frame_signal, stft, istft, spectrogram_magnitude
from .oscillator import harmonic_oscillator_bank, phase_accumulate, final_phase
from .fir import (
    windowed_fir_from_magnitude,
    fft_convolve_circular,
    fft_convolve_full,
    fir_noise_filter,
)
from .mel import mel_filterbank, mfcc, dct_ii, power_to_db
from .loudness import (
    extract_perceptual_loudness,
    extract_rms,
    amplitude_to_db,
    a_weighting,
)
from .resample import resample_kaiser
from .f0 import yin_f0

__all__ = [
    "hann_window",
    "kaiser_window",
    "linear_upsample",
    "cubic_upsample",
    "overlap_add_upsample",
    "frame_signal",
    "stft",
    "istft",
    "spectrogram_magnitude",
    "harmonic_oscillator_bank",
    "phase_accumulate",
    "final_phase",
    "windowed_fir_from_magnitude",
    "fft_convolve_circular",
    "fft_convolve_full",
    "fir_noise_filter",
    "mel_filterbank",
    "mfcc",
    "dct_ii",
    "power_to_db",
    "extract_perceptual_loudness",
    "extract_rms",
    "amplitude_to_db",
    "a_weighting",
    "resample_kaiser",
    "yin_f0",
]
