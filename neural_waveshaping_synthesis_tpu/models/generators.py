"""Signal generators: harmonic exciter, FIR noise synth, learned reverb.

Thin configurable wrappers over the pure ops (``ops/oscillator.py``,
``ops/fir.py``) plus the learned reverb IR parameter. Reference:
``models/modules/generators.py`` and ``models/modules/shaping.py:154-173``.
"""
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

from .. import minigin as gin
import jax
import jax.numpy as jnp

from ..ops.fir import fft_convolve_circular, fir_noise_filter
from ..ops.oscillator import final_phase, harmonic_oscillator_bank
from .modules import Params


@gin.configurable
@dataclass(frozen=True)
class HarmonicOscillator:
    """Antialiased sinusoidal harmonic bank (generators.py:38-66)."""

    n_harmonics: int = 101
    sample_rate: float = 16000

    def apply(
        self,
        f0: jnp.ndarray,
        key: Optional[jax.Array] = None,
        phase_offset: Optional[jnp.ndarray] = None,
        initial_phase: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """(B, T) audio-rate f0 in Hz -> (B, T, n_harmonics)."""
        return harmonic_oscillator_bank(
            f0,
            self.n_harmonics,
            self.sample_rate,
            key=key,
            phase_offset=phase_offset,
            initial_phase=initial_phase,
        )

    def carry_phase(
        self, f0: jnp.ndarray, initial_phase: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        return final_phase(f0, self.sample_rate, initial_phase)


@gin.configurable
@dataclass(frozen=True)
class FIRNoiseSynth:
    """Time-varying windowed-FIR filtered noise (generators.py:11-35)."""

    ir_length: int = 256
    hop_length: int = 128

    def apply(
        self,
        h_re: jnp.ndarray,
        key: Optional[jax.Array] = None,
        noise: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """(B, n_frames, ir_length//2+1) magnitude response -> (B, hop*n_frames)."""
        return fir_noise_filter(h_re, self.hop_length, key, noise=noise)


@gin.configurable
@dataclass(frozen=True)
class Reverb:
    """Learned impulse-response reverb with a pinned leading zero.

    The IR parameter has sr*length-1 samples initialized to randn*1e-6;
    a constant zero is prepended at apply time so the dry signal's first
    sample is untouched (shaping.py:158-162). Convolution is CIRCULAR at
    max(len(x), len(ir)) — the reference's wrap-around quirk, preserved
    for checkpoint parity.
    """

    length_in_seconds: int = 2
    sr: int = 16000

    @property
    def ir_samples(self) -> int:
        return self.sr * self.length_in_seconds - 1

    def init(self, key) -> Params:
        return {"ir": jax.random.normal(key, (self.ir_samples,)) * 1e-6}

    def impulse_response(self, p: Params) -> jnp.ndarray:
        return jnp.concatenate([jnp.zeros((1,), p["ir"].dtype), p["ir"]])

    def apply(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T) -> (B, T): dry + circular FFT convolution with the IR."""
        return x + fft_convolve_circular(x, self.impulse_response(p))
