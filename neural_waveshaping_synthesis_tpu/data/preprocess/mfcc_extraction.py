"""MFCC extraction wrapper (reference ``data/utils/mfcc_extraction.py``).

Stored as control channels 3-18 for dataset-format parity; the model
never consumes them (reference quirk, SURVEY.md §2a #17)."""
import jax
import jax.numpy as jnp
import numpy as np

from ... import minigin as gin
from ...ops.mel import mfcc as _mfcc_op
from .bucketing import pad_to_quantum

_mfcc_jit = jax.jit(
    _mfcc_op,
    static_argnames=("sample_rate", "n_fft", "hop_length", "n_mfcc", "n_mels"),
)


@gin.configurable
def extract_mfcc(
    audio: np.ndarray,
    sample_rate: float = 16000,
    n_fft: int = 1024,
    hop_length: int = 128,
    n_mfcc: int = 16,
) -> np.ndarray:
    padded, true_len = pad_to_quantum(np.asarray(audio, np.float32))
    n_frames = 1 + true_len // hop_length
    return np.asarray(
        _mfcc_jit(
            jnp.asarray(padded),
            sample_rate=sample_rate,
            n_fft=n_fft,
            hop_length=hop_length,
            n_mfcc=n_mfcc,
        )
    )[..., :n_frames]
