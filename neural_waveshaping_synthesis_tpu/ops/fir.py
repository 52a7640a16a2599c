"""Time-varying FIR filtering and FFT convolution.

TPU-native equivalents of the reference's noise branch and reverb:

* ``windowed_fir_from_magnitude`` — zero-phase magnitude response ->
  linear-phase windowed FIR (reference ``models/modules/generators.py:21-28``:
  irfft -> roll(ir_length/2) -> hann window -> rfft).
* ``fir_noise_filter`` — the full FIRNoiseSynth path
  (``generators.py:30-35``): uniform(0,1) noise (the reference's quirky
  non-zero-mean excitation, one vector shared across the batch), STFT at
  (n_fft=ir_length, hop, rectangular window, center=True/reflect),
  per-frame complex multiply by the FIR response, rectangular iSTFT with
  center=False, trimmed to hop*n_frames samples.
* ``fft_convolve_circular`` — circular FFT convolution at
  max(len(x), len(ir)) with wrap-around, exactly the reference Reverb's
  convolution (``models/modules/shaping.py:161-173`` does NOT zero-pad
  to full linear length; the tail wraps — a quirk the pretrained
  checkpoints bake in, so we reproduce it).
"""
from typing import Optional

import jax
import jax.numpy as jnp

from .stft import stft, istft
from .windows import hann_window


def windowed_fir_from_magnitude(
    h_re: jnp.ndarray, window: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Magnitude response frames -> complex frequency response of a
    windowed linear-phase FIR.

    Args:
      h_re: ``(..., n_frames, n_bins)`` real (zero-phase) response;
        ir_length = 2*(n_bins-1).
      window: ``(ir_length,)`` taper; default periodic Hann
        (torch.hann_window default, generators.py:18).

    Returns:
      ``(..., n_frames, n_bins)`` complex response.
    """
    n_bins = h_re.shape[-1]
    ir_length = 2 * (n_bins - 1)
    h = jnp.fft.irfft(h_re.astype(jnp.complex64), n=ir_length, axis=-1)
    h = jnp.roll(h, ir_length // 2, axis=-1)
    if window is None:
        window = hann_window(ir_length, periodic=True)
    h = h * window
    return jnp.fft.rfft(h, n=ir_length, axis=-1)


def fir_noise_filter(
    h_re: jnp.ndarray,
    hop_length: int,
    key: jax.Array,
    window: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Filtered-noise synthesis from per-frame magnitude responses.

    Args:
      h_re: ``(B, n_frames, n_bins)`` real magnitude response per control
        frame; ir_length = n_fft = 2*(n_bins-1).
      hop_length: STFT hop (the control hop, 128).
      key: PRNG key for the uniform noise excitation.
      window: optional FIR taper override.
      noise: optional explicit noise vector ``(hop*n_frames - 1,)`` for
        deterministic tests.

    Returns:
      ``(B, hop_length * n_frames)`` noise branch audio.
    """
    b, n_frames, n_bins = h_re.shape
    n_fft = 2 * (n_bins - 1)

    h_z = windowed_fir_from_magnitude(h_re, window)  # (B, F, bins) complex

    if noise is None:
        if key is None:
            raise ValueError(
                "fir_noise_filter needs a PRNG key or an explicit noise vector"
            )
        # One noise vector shared across the batch, uniform in [0, 1) —
        # deliberately matching the reference's torch.rand excitation
        # (non-zero-mean, NOT gaussian; generators.py:30).
        noise = jax.random.uniform(
            key, (hop_length * n_frames - 1,), dtype=h_re.dtype
        )
    x = stft(noise, n_fft, hop_length, window=None, center=True)  # (F, bins)
    y = x[None, :, :] * h_z
    audio = istft(y, n_fft, hop_length, window=None, center=False)
    return audio[..., : hop_length * n_frames]


def fft_convolve_circular(x: jnp.ndarray, ir: jnp.ndarray) -> jnp.ndarray:
    """Circular convolution of ``(..., T)`` with ``(T_ir,)`` at length
    max(T, T_ir), trimmed back to T. Wrap-around is intentional (see
    module docstring)."""
    t = x.shape[-1]
    n = max(t, ir.shape[-1])
    y = jnp.fft.irfft(
        jnp.fft.rfft(x, n=n, axis=-1) * jnp.fft.rfft(ir, n=n), n=n, axis=-1
    )
    return y[..., :t]


def partition_ir_spectra(ir: jnp.ndarray, block: int) -> jnp.ndarray:
    """Split an IR into zero-padded blocks and rfft each at 2*block ->
    (P, block+1) complex spectra (precompute once per block size)."""
    n_part = -(-ir.shape[-1] // block)
    padded = jnp.pad(ir, (0, n_part * block - ir.shape[-1]))
    return jnp.fft.rfft(padded.reshape(n_part, block), n=2 * block, axis=-1)


def partitioned_convolve_step(
    x_block: jnp.ndarray,
    fdl: jnp.ndarray,
    tail: jnp.ndarray,
    ir_spectra: jnp.ndarray,
):
    """One block of uniform-partitioned FFT convolution (streaming linear
    convolution with an arbitrarily long IR at one-block latency).

    Args:
      x_block: (B, N) new input block.
      fdl: (B, P, N+1) frequency-domain delay line (newest first).
      tail: (B, N) overlap-add carry.
      ir_spectra: (P, N+1) from ``partition_ir_spectra``.

    Returns: (y (B, N), fdl', tail').
    """
    n = x_block.shape[-1]
    x_spec = jnp.fft.rfft(x_block, n=2 * n, axis=-1)
    fdl = jnp.roll(fdl, 1, axis=1).at[:, 0, :].set(x_spec)
    acc = jnp.einsum("bpk,pk->bk", fdl, ir_spectra)
    full = jnp.fft.irfft(acc, n=2 * n, axis=-1)
    y = full[..., :n] + tail
    return y, fdl, full[..., n:]


def fft_convolve_full(x: jnp.ndarray, ir: jnp.ndarray) -> jnp.ndarray:
    """Linear (non-circular) FFT convolution, full length T + T_ir - 1.

    Not used by the checkpoint-parity path (which wraps), but the right
    primitive for the streaming reverb's partitioned convolution."""
    t = x.shape[-1]
    t_ir = ir.shape[-1]
    n = t + t_ir - 1
    return jnp.fft.irfft(
        jnp.fft.rfft(x, n=n, axis=-1) * jnp.fft.rfft(ir, n=n), n=n, axis=-1
    )[..., :n]
