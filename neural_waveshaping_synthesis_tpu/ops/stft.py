"""Framed STFT / iSTFT with torch-compatible semantics.

The reference leans on ``torch.stft`` / ``torch.istft`` in two places
whose exact framing semantics are checkpoint-parity requirements:

* the FIR noise synth (reference ``models/modules/generators.py:31-35``):
  ``torch.stft(noise, 256, 128)`` (rectangular window, center=True,
  reflect padding) followed by ``torch.istft(Y, 256, 128, center=False)``;
* the multi-resolution STFT loss (auraloss 0.2.1 defaults, hann window,
  center=True).

Everything here is shape-static and jit-friendly. Signals are
time-last ``(..., T)``; spectrograms are ``(..., n_frames, n_bins)``
(frames on the sublane axis, frequency bins on the 128-lane axis — an
``n_fft`` of 256 puts 129 bins on the lane dimension, which XLA pads
to 2 registers; larger FFTs tile cleanly).
"""
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp

from .windows import hann_window


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def frame_signal(
    x: jnp.ndarray, frame_length: int, hop_length: int
) -> jnp.ndarray:
    """Slice ``(..., T)`` into overlapping frames ``(..., n_frames, frame_length)``.

    n_frames = 1 + (T - frame_length) // hop_length  (complete frames only,
    matching torch.stft / librosa.util.frame).

    Built from strided slices over gcd-sized blocks instead of a 2-D
    gather: frame j is the concatenation of frame_length/g consecutive
    g-blocks starting at block j*hop/g. Large-index gathers compile
    pathologically on the TPU backend (minutes); k static strided
    slices + one concat compile in milliseconds and run equally fast.

    The backward (the linear transpose = overlap-add) is a custom VJP:
    XLA's transpose of k strided slices is k dilated pads, which
    dominated the training step (146 ms for one 512/50 STFT loss
    resolution). The custom OLA reshapes frames into hop-sized parts
    and sums ceil(frame/hop) shifted arrays instead.
    """
    return _frame_signal_impl(x, frame_length, hop_length)


def _frame_signal_impl(x, frame_length, hop_length):
    import math

    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop_length
    g = math.gcd(frame_length, hop_length)
    k = frame_length // g
    s = hop_length // g

    if k > 512:
        # degenerate hop/frame ratios: fall back to the gather form
        idx = (
            jnp.arange(n_frames)[:, None] * hop_length
            + jnp.arange(frame_length)[None, :]
        )
        return x[..., idx]

    nb = t // g
    blocks = x[..., : nb * g].reshape(x.shape[:-1] + (nb, g))
    parts = [
        jax.lax.slice_in_dim(blocks, i, i + (n_frames - 1) * s + 1, s, axis=-2)
        for i in range(k)
    ]
    return jnp.concatenate(parts, axis=-1)


def overlap_add(
    frames: jnp.ndarray, hop_length: int, out_length: int
) -> jnp.ndarray:
    """Sum frames ``(..., n_frames, L)`` at hop-spaced offsets into
    ``(..., out_length)`` — the exact linear transpose of frame_signal,
    vectorized as ceil(L/hop) shifted hop-block adds."""
    *batch, n_frames, length = frames.shape
    r = -(-length // hop_length)
    padded = jnp.pad(
        frames, [(0, 0)] * len(batch) + [(0, 0), (0, r * hop_length - length)]
    )
    parts = padded.reshape(*batch, n_frames, r, hop_length)
    blocks = jnp.zeros((*batch, n_frames + r - 1, hop_length), frames.dtype)
    for i in range(r):
        blocks = blocks.at[..., i : i + n_frames, :].add(parts[..., :, i, :])
    flat = blocks.reshape(*batch, (n_frames + r - 1) * hop_length)
    if flat.shape[-1] < out_length:
        flat = jnp.pad(
            flat, [(0, 0)] * len(batch) + [(0, out_length - flat.shape[-1])]
        )
    return flat[..., :out_length]


def _frame_signal_fwd(x, frame_length, hop_length):
    return _frame_signal_impl(x, frame_length, hop_length), x.shape[-1]


def _frame_signal_bwd(frame_length, hop_length, t, g):
    return (overlap_add(g, hop_length, t),)


frame_signal.defvjp(_frame_signal_fwd, _frame_signal_bwd)


def _pad_center(x: jnp.ndarray, n_fft: int, pad_mode: str) -> jnp.ndarray:
    pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    return jnp.pad(x, pad, mode=pad_mode)


def _expand_window(
    window: Optional[jnp.ndarray], n_fft: int, win_length: Optional[int]
) -> jnp.ndarray:
    """torch.stft semantics: a win_length<n_fft window is zero-padded to
    n_fft, centered. No window means rectangular ones(n_fft)."""
    if window is None:
        if win_length is not None and win_length < n_fft:
            window = jnp.ones((win_length,), dtype=jnp.float32)
        else:
            return jnp.ones((n_fft,), dtype=jnp.float32)
    wl = window.shape[0]
    if wl < n_fft:
        left = (n_fft - wl) // 2
        window = jnp.pad(window, (left, n_fft - wl - left))
    return window


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Complex STFT of ``(..., T)`` -> ``(..., n_frames, n_fft//2+1)``.

    Matches ``torch.stft(..., return_complex=True)`` up to the frame/bin
    axis order (torch puts bins before frames; we keep frames first so
    bins ride the TPU lane axis).
    """
    w = _expand_window(window, n_fft, win_length)
    if center:
        x = _pad_center(x, n_fft, pad_mode)
    frames = frame_signal(x, n_fft, hop_length)
    return jnp.fft.rfft(frames * w, n=n_fft, axis=-1)


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT of ``(..., n_frames, n_bins)`` -> ``(..., T)``.

    torch.istft semantics: windowed overlap-add normalized by the
    overlap-added squared window (NOLA). ``center=False`` keeps the full
    ``n_fft + hop*(n_frames-1)`` output (the FIR noise branch path);
    ``center=True`` trims n_fft//2 from each end.
    """
    w = _expand_window(window, n_fft, win_length)
    n_frames = spec.shape[-2]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * w

    out_len = n_fft + hop_length * (n_frames - 1)
    y = overlap_add(frames, hop_length, out_len)
    wsq = overlap_add(
        jnp.broadcast_to(w * w, (n_frames, n_fft)), hop_length, out_len
    )
    y = y / jnp.where(wsq > 1e-11, wsq, 1.0)

    if center:
        y = y[..., n_fft // 2 : out_len - n_fft // 2]
    if length is not None:
        y = y[..., :length]
    return y


def spectrogram_magnitude(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    pad_mode: str = "reflect",
    eps: float = 1e-8,
) -> jnp.ndarray:
    """|STFT| with a numerical floor — the primitive under the
    multi-resolution STFT loss (auraloss clamps |X|^2 at 1e-8 before
    the sqrt; we match)."""
    spec = stft(x, n_fft, hop_length, win_length, window, center, pad_mode)
    power = spec.real * spec.real + spec.imag * spec.imag
    return jnp.sqrt(jnp.maximum(power, eps))


# ---------------------------------------------------------------------------
# Polyphase matmul DFT — the training-loss spectrogram
# ---------------------------------------------------------------------------
@lru_cache(maxsize=None)
def _dft_basis(n_fft: int, dtype_name: str):
    """Real-DFT analysis basis ``(2*(n_fft//2+1), n_fft)`` as
    ``[Re; Im]`` rows, built in f64 and cast once (numpy, cached)."""
    import numpy as np

    bins = n_fft // 2 + 1
    n = np.arange(n_fft)
    f = np.arange(bins)[:, None]
    ang = 2.0 * np.pi * f * n / n_fft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=0).astype(dtype_name)


def polyphase_dft_magnitude(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    pad_mode: str = "reflect",
    eps: float = 1e-8,
    precision=jax.lax.Precision.HIGHEST,
    variant: str = "einsum",
) -> jnp.ndarray:
    """|STFT| of ``(..., T)`` -> ``(..., n_frames, n_fft//2+1)`` as a
    sum of dense MXU matmuls — same values as ``spectrogram_magnitude``
    (windowed centered torch.stft semantics), radically cheaper
    fwd+bwd on TPU.

    Why: profiling the training step (docs/DESIGN.md §3.3) showed the
    framed path's data movement — k strided slices concatenated into a
    (B, n_frames, n_fft) tensor in a 2-element-lane layout, then
    layout-copied for the FFT — cost ~36 ms/step of the 95 ms step,
    while the rFFTs themselves cost 0.2 ms. This form never
    materializes frames: the signal is reshaped into hop-sized blocks
    (free — hop divides every frame offset by construction), and frame
    j's DFT is accumulated over the ceil(n_fft/hop) block-aligned
    sections of the basis:

        out[..., j, :] = sum_i blocks[..., j+i, :] @ basis[:, i*hop:(i+1)*hop].T

    Each term is a CONTIGUOUS shifted view of the block array (frames
    advance one block per hop) feeding a dense (hop, 2*bins) matmul —
    pure MXU work, and the backward is the same matmuls transposed
    into zero-pads instead of overlap-add scatters.

    ``precision=HIGHEST`` keeps f32 matmul error ~1e-6 relative (the
    auraloss-oracle test tolerance is 1e-3); the default-bf16 MXU pass
    would be ~1e-3 per bin. float64 inputs fall back to the framed FFT
    path: the k-term accumulation order is program-dependent under
    sharding, which would break the exact cross-mesh fit-equivalence
    contract (tests/test_training.py) that f64 exists to serve.
    """
    if jnp.result_type(x) == jnp.float64:
        return spectrogram_magnitude(
            x, n_fft, hop_length, win_length, window, center, pad_mode, eps
        )
    w = _expand_window(window, n_fft, win_length).astype(x.dtype)
    if center:
        x = _pad_center(x, n_fft, pad_mode)
    t = x.shape[-1]
    h = hop_length
    n_frames = 1 + (t - n_fft) // h
    bins = n_fft // 2 + 1

    basis = jnp.asarray(_dft_basis(n_fft, jnp.result_type(x).name))
    atoms = basis * w[None, :]  # loop-invariant; XLA hoists out of scans

    kf, r = divmod(n_fft, h)
    nb = n_frames - 1 + kf + (1 if r else 0)
    if nb * h > t:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, nb * h - t)])
    blocks = x[..., : nb * h].reshape(x.shape[:-1] + (nb, h))

    if variant == "einsum":
        out = None
        for i in range(kf):
            part = jax.lax.slice_in_dim(blocks, i, i + n_frames, axis=-2)
            term = jnp.einsum(
                "...nh,kh->...nk", part, atoms[:, i * h : (i + 1) * h],
                precision=precision,
            )
            out = term if out is None else out + term
        if r:
            # kf == 0 (hop > n_fft: frames don't span even one block)
            # makes this the only term — ``out`` is still None then.
            part = jax.lax.slice_in_dim(
                blocks, kf, kf + n_frames, axis=-2
            )[..., :r]
            term = jnp.einsum(
                "...nr,kr->...nk", part, atoms[:, kf * h :],
                precision=precision,
            )
            out = term if out is None else out + term
    elif variant == "conv":
        # Same accumulation as ONE valid conv over the BLOCK axis:
        # hop-sized blocks are the feature dim (h input channels),
        # frames advance one block per hop, so a width-ceil(n_fft/h)
        # kernel whose tap i is the basis section atoms[:, i*h:(i+1)*h]
        # computes out[..., j, :] in a single (K = kf_pad*h >= n_fft)
        # contraction — fewer, larger MXU ops than the einsum loop
        # (same values; the block-level channel layout is what the
        # failed sample-level NCH conv attempt lacked, training/loss.py
        # history). A/B against "einsum" on hardware via
        # scripts/profile_train_step.py --loss-variant.
        kf_pad = kf + (1 if r else 0)
        a = atoms
        if r:
            a = jnp.pad(atoms, ((0, 0), (0, kf_pad * h - n_fft)))
        kernel = a.reshape(2 * bins, kf_pad, h)  # (O, W, I)
        lead = blocks.shape[:-2]
        inp = blocks.reshape((-1,) + blocks.shape[-2:])  # (N, nb, h)
        out = jax.lax.conv_general_dilated(
            inp,
            jnp.transpose(kernel, (1, 2, 0)),  # (W, I, O)
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            precision=precision,
        )
        out = out.reshape(lead + (n_frames, 2 * bins))
    else:
        raise ValueError(f"unknown polyphase variant {variant!r}")

    power = out[..., :bins] ** 2 + out[..., bins:] ** 2
    return jnp.sqrt(jnp.maximum(power, eps))
