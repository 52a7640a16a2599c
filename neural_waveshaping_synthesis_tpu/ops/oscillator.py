"""Harmonic oscillator bank.

TPU-first equivalent of the reference's ``HarmonicOscillator``
(reference ``models/modules/generators.py:38-66``): the only sequential
dependency is the phase integral, expressed as a cumulative sum that
XLA lowers to a log-depth parallel scan; the harmonic expansion is a
broadcasted outer product over the lane axis.

Layout: ``f0`` is ``(B, T)`` audio-rate Hz; the bank output is
channels-last ``(B, T, H)`` so the harmonic axis (101 -> padded 128)
rides the TPU vector lanes and feeds straight into the 101->64 mixer
matmul on the MXU.
"""
import math
from typing import Optional

import jax
import jax.numpy as jnp

from .fastmath import fast_sin

TAU = 2.0 * math.pi

# Escape hatch: exact XLA sin for the bank (A/B tests, other platforms).
# The polynomial sine cuts the bank's dominant cost ~4x; its worst-case
# error at the wrapped-phase argument bound tau*H (~634 rad) is 1.8e-4
# — the f32 REPRESENTATION of such a phase already carries ~6e-5 rad of
# quantization, and golden tolerance is 1e-3 nRMS (see ops/fastmath.py).
EXACT_SIN = False


def phase_accumulate(f0: jnp.ndarray, sample_rate: float) -> jnp.ndarray:
    """Integrated phase in radians: tau * cumsum(f0) / sr along time (axis -1).

    Matches the reference phase recursion (generators.py:59) including its
    quirk that the first sample already advances by f0[0]/sr.
    """
    return TAU * jnp.cumsum(f0, axis=-1) / sample_rate


def harmonic_oscillator_bank(
    f0: jnp.ndarray,
    n_harmonics: int,
    sample_rate: float,
    key: Optional[jax.Array] = None,
    phase_offset: Optional[jnp.ndarray] = None,
    initial_phase: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Antialiased sinusoidal harmonic bank.

    Args:
      f0: ``(B, T)`` fundamental in Hz at audio rate.
      n_harmonics: number of harmonics H (harmonic k has frequency k*f0).
      sample_rate: audio sample rate.
      key: PRNG key for per-harmonic random phase offsets in [-pi, pi),
        drawn fresh per call — the reference draws them per forward
        (generators.py:54-56, shared across the batch). Ignored if
        ``phase_offset`` is given.
      phase_offset: explicit ``(H,)`` or ``(B, H)`` phase offsets
        (deterministic tests / streaming continuity).
      initial_phase: ``(B,)`` carried phase accumulator for streaming;
        added to the integrated phase.

    Returns:
      ``(B, T, H)`` bank of sinusoids, harmonics above Nyquist zeroed.
    """
    phase = phase_accumulate(f0, sample_rate)  # (B, T)
    if initial_phase is not None:
        phase = phase + initial_phase[:, None]
    if phase_offset is None and key is not None:
        phase_offset = draw_phase_offset(key, n_harmonics, f0.dtype)
    return bank_from_phase(phase, f0, n_harmonics, sample_rate, phase_offset)


def draw_phase_offset(key: jax.Array, n_harmonics: int, dtype=jnp.float32):
    """The reference's fresh per-forward phase draw: uniform [-pi, pi),
    shared across the batch (generators.py:54-56)."""
    return jax.random.uniform(key, (n_harmonics,), dtype=dtype) * TAU - math.pi


def bank_from_phase(
    phase: jnp.ndarray,
    f0: jnp.ndarray,
    n_harmonics: int,
    sample_rate: float,
    phase_offset: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Harmonic bank from an ALREADY-integrated phase track.

    The single source of truth for the bank formula — used by the
    standard path above and by time-sharded rendering, where the phase
    integral is computed globally and each shard receives its slice
    (parallel/time_shard.py).

    Args: phase (B, T) radians; f0 (B, T) Hz (for the antialias mask).
    Returns (B, T, H).
    """
    k = jnp.arange(1, n_harmonics + 1, dtype=f0.dtype)  # (H,)
    if phase_offset is None:
        phase_offset = jnp.zeros((n_harmonics,), dtype=f0.dtype)
    if phase_offset.ndim == 1:
        phase_offset = phase_offset[None, None, :]  # (1, 1, H)
    else:
        phase_offset = phase_offset[:, None, :]  # (B, 1, H)

    # Wrap BEFORE the harmonic expansion: k is an integer, so
    # sin(k*(phi mod tau) + o) == sin(k*phi + o) exactly — but the
    # wrapped argument stays <= tau*H (~634) instead of growing with
    # clip length, where f32's eps(k*phi) reaches ~0.03 rad after a few
    # seconds and makes the sine's value depend on fusion order. This
    # is strictly MORE accurate than the reference's unwrapped torch
    # arithmetic, and it makes renders reproducible across program
    # shapes (offline vs time-sharded vs streaming).
    phase = jnp.mod(phase, TAU)
    harmonic_phase = phase[..., None] * k + phase_offset  # (B, T, H)
    antialias = (f0[..., None] * k) < (sample_rate / 2.0)
    sin = jnp.sin if EXACT_SIN else fast_sin
    return sin(harmonic_phase) * antialias.astype(f0.dtype)


def final_phase(
    f0: jnp.ndarray, sample_rate: float, initial_phase: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Phase accumulator value after the last sample — the carry for
    streaming synthesis (wrapped to [0, tau) to keep precision over
    long streams)."""
    total = TAU * jnp.sum(f0, axis=-1) / sample_rate
    if initial_phase is not None:
        total = total + initial_phase
    return jnp.mod(total, TAU)
