"""STFT/iSTFT parity with torch.stft/istft (the loss + noise-branch
framing semantics the checkpoints depend on)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from neural_waveshaping_synthesis_tpu.ops import stft, istft, frame_signal
from neural_waveshaping_synthesis_tpu.ops.windows import hann_window


def _torch_stft(x, n_fft, hop, window=None, center=True):
    spec = torch.stft(
        torch.tensor(x),
        n_fft,
        hop,
        window=torch.tensor(np.asarray(window)) if window is not None else None,
        center=center,
        return_complex=True,
    )
    return spec.numpy()  # (bins, frames)


@pytest.mark.parametrize("n_fft,hop", [(256, 128), (1024, 120), (512, 50)])
def test_stft_matches_torch_rect(rng, n_fft, hop):
    x = rng.standard_normal(4096).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop, center=True))
    ref = _torch_stft(x, n_fft, hop, center=True)
    np.testing.assert_allclose(ours.T, ref, rtol=1e-4, atol=1e-4)


def test_stft_matches_torch_hann(rng):
    n_fft, hop, win_length = 1024, 120, 600
    x = rng.standard_normal(8000).astype(np.float32)
    w = hann_window(win_length, periodic=True)
    ours = np.asarray(
        stft(jnp.asarray(x), n_fft, hop, win_length=win_length, window=w)
    )
    ref = torch.stft(
        torch.tensor(x),
        n_fft,
        hop,
        win_length=win_length,
        window=torch.hann_window(win_length),
        center=True,
        return_complex=True,
    ).numpy()
    np.testing.assert_allclose(ours.T, ref, rtol=1e-3, atol=1e-4)


def test_istft_matches_torch_rect_center_false(rng):
    """The FIR noise synth path: rectangular iSTFT with center=False."""
    n_fft, hop = 256, 128
    x = rng.standard_normal(n_fft + hop * 19).astype(np.float32)
    spec = torch.stft(torch.tensor(x), n_fft, hop, center=False, return_complex=True)
    ref = torch.istft(spec, n_fft, hop, center=False).numpy()
    ours = np.asarray(istft(jnp.asarray(spec.numpy().T), n_fft, hop, center=False))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_istft_roundtrip_hann(rng):
    n_fft, hop = 512, 128
    x = rng.standard_normal(n_fft + hop * 31).astype(np.float32)
    w = hann_window(n_fft, periodic=True)
    spec = stft(jnp.asarray(x), n_fft, hop, window=w, center=True)
    y = np.asarray(istft(spec, n_fft, hop, window=w, center=True, length=len(x)))
    np.testing.assert_allclose(y, x, rtol=1e-4, atol=1e-4)


def test_frame_signal_shape(rng):
    x = jnp.asarray(rng.standard_normal((2, 1000)).astype(np.float32))
    frames = frame_signal(x, 256, 128)
    assert frames.shape == (2, 1 + (1000 - 256) // 128, 256)
    np.testing.assert_array_equal(np.asarray(frames[0, 1]), np.asarray(x[0, 128:384]))


# ---------------------------------------------------------------------------
# polyphase matmul DFT (the training-loss spectrogram path)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "n_fft,hop,win", [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240),
                      (256, 128, 256), (256, 512, 256)]
)
@pytest.mark.parametrize("variant", ["einsum", "conv"])
def test_polyphase_dft_matches_framed_fft(rng, n_fft, hop, win, variant):
    """Bit-for-purpose parity with the framed-FFT spectrogram across
    the auraloss default resolutions (incl. a hop-divides-frame case
    with no partial block and a hop > n_fft case), for both the
    einsum-loop and block-conv formulations."""
    from neural_waveshaping_synthesis_tpu.ops.stft import (
        polyphase_dft_magnitude,
        spectrogram_magnitude,
    )

    x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.3)
    w = hann_window(win, periodic=True)
    ref = np.asarray(
        spectrogram_magnitude(x, n_fft, hop, win_length=win, window=w)
    )
    ours = np.asarray(
        polyphase_dft_magnitude(x, n_fft, hop, win_length=win, window=w,
                                variant=variant)
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_polyphase_dft_gradient_matches_framed(rng):
    """The two formulations are the same linear map, so loss gradients
    through them must agree (custom-OLA VJP vs transposed matmuls)."""
    import jax

    from neural_waveshaping_synthesis_tpu.ops.stft import (
        polyphase_dft_magnitude,
        spectrogram_magnitude,
    )

    x = jnp.asarray(rng.standard_normal((1, 3000)).astype(np.float32) * 0.3)
    w = hann_window(240, periodic=True)

    def loss(fn, v):
        return jnp.sum(fn(v, 512, 50, win_length=240, window=w) ** 2)

    g_ref = np.asarray(jax.grad(lambda v: loss(spectrogram_magnitude, v))(x))
    g_new = np.asarray(jax.grad(lambda v: loss(polyphase_dft_magnitude, v))(x))
    np.testing.assert_allclose(g_new, g_ref, rtol=1e-3, atol=1e-3)


def test_polyphase_dft_f64_falls_back_exactly(rng):
    """f64 inputs must take the framed-FFT path bit-exactly (the
    cross-mesh fit-equivalence contract)."""
    import jax

    from neural_waveshaping_synthesis_tpu.ops.stft import (
        polyphase_dft_magnitude,
        spectrogram_magnitude,
    )

    with jax.enable_x64(True):
        x = jnp.asarray(rng.standard_normal((1, 2000)), jnp.float64)
        w = hann_window(240, periodic=True).astype(jnp.float64)
        a = np.asarray(
            polyphase_dft_magnitude(x, 512, 50, win_length=240, window=w)
        )
        b = np.asarray(
            spectrogram_magnitude(x, 512, 50, win_length=240, window=w)
        )
    np.testing.assert_array_equal(a, b)
