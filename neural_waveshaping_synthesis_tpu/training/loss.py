"""Multi-resolution STFT loss (auraloss 0.2.1 default parity).

The reference constructs ``auraloss.freq.MultiResolutionSTFTLoss()``
with library defaults inside ``configure_optimizers``
(reference ``models/neural_waveshaping.py:93``; pinned auraloss==0.2.1,
requirements.txt:1). Those defaults:

  fft_sizes   = (1024, 2048, 512)
  hop_sizes   = (120, 240, 50)
  win_lengths = (600, 1200, 240)
  window      = hann(win_length), centered STFT (torch.stft default)
  per resolution: spectral convergence + log-magnitude L1, both weight 1
  total = mean over resolutions

Magnitudes are floored at sqrt(1e-8) exactly as auraloss clamps
|X|^2 >= 1e-8 before the sqrt.

TPU notes: all three resolutions are computed inside one jit as
polyphase matmul DFTs (``ops/stft.py polyphase_dft_magnitude`` — no
frame tensor is ever materialized; fwd and bwd are MXU matmuls). Loss
reduction is a full-tensor frobenius norm / mean — under pjit data
parallelism these reduce with ``psum`` over the mesh automatically.
"""
from typing import Sequence

import jax.numpy as jnp

from ..ops.windows import hann_window

DEFAULT_FFT_SIZES = (1024, 2048, 512)
DEFAULT_HOP_SIZES = (120, 240, 50)
DEFAULT_WIN_LENGTHS = (600, 1200, 240)


def stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    fft_size: int,
    hop_size: int,
    win_length: int,
    w_sc: float = 1.0,
    w_log_mag: float = 1.0,
    eps: float = 1e-8,
    spectrogram_variant: str = "einsum",
    precision=None,
) -> jnp.ndarray:
    """Single-resolution STFT loss between input ``x`` and target ``y``.

    sc = ||Y - X||_F / ||Y||_F  (norms over the whole batched tensor)
    log_mag = mean |log Y - log X|

    Spectrograms come from the polyphase matmul DFT
    (``ops/stft.py polyphase_dft_magnitude`` — same values as the
    framed-FFT path, but fwd AND bwd are dense MXU matmuls). The
    framed path's slice/concat data movement was the largest single
    cost in the profiled training step (~36 of 95 ms; the rFFTs
    themselves were 0.2 ms — see the function's docstring and
    docs/DESIGN.md §3.3). An earlier strided-`conv_general_dilated`
    DFT attempt (n_fft-wide kernels, NCH) lowered even worse than
    framing; the polyphase block decomposition is what makes the
    matmul form win (the BLOCK-level conv equivalent is available as
    ``spectrogram_variant="conv"`` for hardware A/B —
    ``polyphase_dft_magnitude``'s docstring). f64 inputs transparently
    use the framed-FFT path (exact cross-mesh fit-equivalence
    contract).
    """
    from ..ops.stft import polyphase_dft_magnitude

    window = hann_window(win_length, periodic=True)
    kwargs = {} if precision is None else {"precision": precision}
    x_mag = polyphase_dft_magnitude(
        x, fft_size, hop_size, win_length=win_length, window=window,
        eps=eps, variant=spectrogram_variant, **kwargs,
    )
    y_mag = polyphase_dft_magnitude(
        y, fft_size, hop_size, win_length=win_length, window=window,
        eps=eps, variant=spectrogram_variant, **kwargs,
    )
    sc = jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)
    log_mag = jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))
    return w_sc * sc + w_log_mag * log_mag


def multi_resolution_stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    fft_sizes: Sequence[int] = DEFAULT_FFT_SIZES,
    hop_sizes: Sequence[int] = DEFAULT_HOP_SIZES,
    win_lengths: Sequence[int] = DEFAULT_WIN_LENGTHS,
    spectrogram_variant: str = "einsum",
    precision=None,
) -> jnp.ndarray:
    """Mean over resolutions of (spectral convergence + log-mag L1)."""
    total = 0.0
    for n_fft, hop, win in zip(fft_sizes, hop_sizes, win_lengths):
        total = total + stft_loss(
            x, y, n_fft, hop, win, spectrogram_variant=spectrogram_variant,
            precision=precision,
        )
    return total / len(fft_sizes)
