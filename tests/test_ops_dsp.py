"""Unit tests for oscillator, FIR, upsampling, loudness, MFCC, resample, YIN."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from neural_waveshaping_synthesis_tpu.ops import (
    harmonic_oscillator_bank,
    phase_accumulate,
    linear_upsample,
    windowed_fir_from_magnitude,
    fft_convolve_circular,
    fir_noise_filter,
    extract_perceptual_loudness,
    amplitude_to_db,
    mfcc,
    resample_kaiser,
    yin_f0,
)
from neural_waveshaping_synthesis_tpu.ops.oscillator import final_phase
from neural_waveshaping_synthesis_tpu.ops.windows import hann_window


def test_linear_upsample_matches_torch(rng):
    x = rng.standard_normal((2, 50, 3)).astype(np.float32)
    ours = np.asarray(linear_upsample(jnp.asarray(x), 50 * 128))
    # torch F.upsample(mode="linear") default align_corners=False
    ref = F.interpolate(
        torch.tensor(x).permute(0, 2, 1), 50 * 128, mode="linear"
    ).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_linear_upsample_integer_fast_path_all_hops(rng):
    """The fused integer fast path must match F.interpolate
    (align_corners=False) for BOTH parities of hop — the half-hop
    shift is hop - hop//2, not hop//2 (regression: the fused-weight
    rewrite initially collapsed the two for odd hops)."""
    from neural_waveshaping_synthesis_tpu.ops.upsample import (
        _linear_upsample_integer,
    )

    x = rng.standard_normal((2, 9, 3)).astype(np.float32)
    for hop in (2, 3, 5, 8, 125, 128):
        ours = np.asarray(_linear_upsample_integer(jnp.asarray(x), hop))
        ref = F.interpolate(
            torch.tensor(x).permute(0, 2, 1), 9 * hop, mode="linear"
        ).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f"hop={hop}")


def test_oscillator_pure_tone():
    sr = 16000
    f0 = jnp.full((1, sr), 440.0)
    bank = harmonic_oscillator_bank(f0, 4, sr, phase_offset=jnp.zeros(4))
    assert bank.shape == (1, sr, 4)
    # harmonic 1 should be sin(tau*440*(n+1)/sr) -- cumsum includes sample 0
    n = np.arange(sr) + 1
    expected = np.sin(2 * np.pi * 440.0 * n / sr)
    np.testing.assert_allclose(np.asarray(bank[0, :, 0]), expected, atol=1e-3)


def test_oscillator_antialias_mask():
    sr = 16000
    f0 = jnp.full((1, 100), 3000.0)
    bank = harmonic_oscillator_bank(f0, 5, sr, phase_offset=jnp.zeros(5))
    # harmonics 3,4,5 are >= 8000 Hz -> zeroed
    assert np.abs(np.asarray(bank[0, :, 2:])).max() == 0.0
    assert np.abs(np.asarray(bank[0, :, 0])).max() > 0.5


def test_final_phase_streaming_continuity():
    sr = 16000
    f0 = jnp.full((1, 256), 440.0)
    full = harmonic_oscillator_bank(
        jnp.concatenate([f0, f0], -1), 3, sr, phase_offset=jnp.zeros(3)
    )
    first = harmonic_oscillator_bank(f0, 3, sr, phase_offset=jnp.zeros(3))
    carry = final_phase(f0, sr)
    second = harmonic_oscillator_bank(
        f0, 3, sr, phase_offset=jnp.zeros(3), initial_phase=carry
    )
    np.testing.assert_allclose(np.asarray(full[:, :256]), np.asarray(first), atol=1e-4)
    np.testing.assert_allclose(np.asarray(full[:, 256:]), np.asarray(second), atol=1e-3)


def test_windowed_fir_matches_torch(rng):
    """irfft -> roll -> hann -> rfft chain parity (generators.py:21-28)."""
    h_re = rng.standard_normal((2, 10, 129)).astype(np.float32)
    ours = np.asarray(windowed_fir_from_magnitude(jnp.asarray(h_re)))

    t = torch.tensor(h_re)
    h = torch.fft.irfft(torch.complex(t, torch.zeros_like(t)))
    h = h.roll(128, -1) * torch.hann_window(256, periodic=True)
    ref = torch.fft.rfft(h).numpy()
    np.testing.assert_allclose(ours.real, ref.real, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ours.imag, ref.imag, rtol=1e-3, atol=1e-4)


def test_fir_noise_filter_matches_torch_pipeline(rng):
    """End-to-end noise branch vs a stock-torch reimplementation with
    the same injected noise."""
    b, frames, bins, hop = 2, 20, 129, 128
    n_fft = 256
    h_re = (rng.standard_normal((b, frames, bins)) * 0.1).astype(np.float32)
    noise = rng.random(hop * frames - 1).astype(np.float32)

    ours = np.asarray(
        fir_noise_filter(jnp.asarray(h_re), hop, key=None, noise=jnp.asarray(noise))
    )

    t = torch.tensor(h_re).transpose(1, 2)  # (B, bins, frames) like reference layout
    h = torch.fft.irfft(torch.complex(t, torch.zeros_like(t)).transpose(1, 2))
    h = h.roll(n_fft // 2, -1) * torch.hann_window(n_fft, periodic=True)
    H = torch.fft.rfft(h)  # (B, frames, bins)
    X = torch.stft(torch.tensor(noise), n_fft, hop, return_complex=True)  # (bins, F)
    Y = X.unsqueeze(0) * H.transpose(1, 2)
    y = torch.istft(Y, n_fft, hop, center=False)
    ref = y[:, : frames * hop].numpy()

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_fft_convolve_circular_wraps(rng):
    x = rng.standard_normal((1, 64)).astype(np.float32)
    ir = np.zeros(64, dtype=np.float32)
    ir[10] = 1.0
    y = np.asarray(fft_convolve_circular(jnp.asarray(x), jnp.asarray(ir)))
    expected = np.roll(x, 10, axis=-1)  # circular shift by 10
    np.testing.assert_allclose(y, expected, atol=1e-4)


def test_loudness_range_and_shape(rng):
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    loud = np.asarray(extract_perceptual_loudness(jnp.asarray(audio)))
    assert loud.shape == (1 + 16000 // 128,)
    assert loud.min() >= 0.0 and loud.max() <= 1.0 + 1e-6


def test_amplitude_to_db_matches_librosa_formula(rng):
    mag = np.abs(rng.standard_normal((5, 10)).astype(np.float32)) + 1e-3
    db = np.asarray(amplitude_to_db(jnp.asarray(mag)))
    ref = 20 * np.log10(np.maximum(mag, 1e-5)) - 20 * np.log10(mag.max())
    ref = np.maximum(ref, ref.max() - 80.0)
    np.testing.assert_allclose(db, ref, rtol=1e-4, atol=1e-4)


def test_mfcc_shape(rng):
    audio = rng.standard_normal(16000).astype(np.float32)
    coeffs = np.asarray(mfcc(jnp.asarray(audio)))
    assert coeffs.shape == (16, 1 + 16000 // 128)
    assert np.isfinite(coeffs).all()


def _torch_magnitude_stft(audio, n_fft, hop):
    """Centered reflect-padded periodic-hann STFT magnitude via stock
    torch, shaped (bins, frames) — the librosa.stft front half of both
    extractors (reference data/utils/loudness_extraction.py:22-30,
    mfcc_extraction.py:6-13)."""
    X = torch.stft(
        torch.tensor(audio), n_fft, hop_length=hop,
        window=torch.hann_window(n_fft, periodic=True),
        center=True, pad_mode="reflect", return_complex=True,
    )
    return X.abs().numpy().astype(np.float64)


def test_loudness_full_chain_matches_oracle(rng):
    """End-to-end extract_perceptual_loudness vs an independent
    torch-STFT + explicit-formula rebuild of the reference chain:
    |STFT| -> power dB ref=max top_db=80 -> mean over bins -> (x+80)/80
    (reference data/utils/loudness_extraction.py:11-45, A-weighting
    computed but unapplied)."""
    sr, n_fft, hop = 16000, 1024, 128
    t = np.arange(sr) / sr
    audio = (
        0.3 * np.sin(2 * np.pi * 220.0 * t)
        + 0.05 * rng.standard_normal(sr)
    ).astype(np.float32)

    ours = np.asarray(extract_perceptual_loudness(jnp.asarray(audio)))

    S = _torch_magnitude_stft(audio, n_fft, hop)  # (bins, frames)
    amin = 1e-5
    power = np.maximum(S, 0.0) ** 2
    db = 10.0 * np.log10(np.maximum(power, amin**2))
    db -= 10.0 * np.log10(max(power.max(), amin**2))
    db = np.maximum(db, db.max() - 80.0)
    expected = (db.mean(axis=0) + 80.0) / 80.0

    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=2e-4)


def test_loudness_a_weighted_full_chain_matches_oracle(rng):
    """The apply_a_weighting=True variant (the reference's commented-out
    `+ weights`, loudness_extraction.py:38) vs the same oracle with the
    IEC 61672 curve added per-bin before the mean."""
    sr, n_fft, hop = 16000, 1024, 128
    audio = (0.2 * rng.standard_normal(8000)).astype(np.float32)

    ours = np.asarray(
        extract_perceptual_loudness(jnp.asarray(audio), apply_a_weighting=True)
    )

    S = _torch_magnitude_stft(audio, n_fft, hop)
    amin = 1e-5
    power = np.maximum(S, 0.0) ** 2
    db = 10.0 * np.log10(np.maximum(power, amin**2))
    db -= 10.0 * np.log10(max(power.max(), amin**2))
    db = np.maximum(db, db.max() - 80.0)
    f2 = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2) ** 2
    ra = (
        12194.217**2 * f2**2
        / (
            (f2 + 20.598997**2)
            * np.sqrt((f2 + 107.65265**2) * (f2 + 737.86223**2))
            * (f2 + 12194.217**2)
        )
    )
    with np.errstate(divide="ignore"):
        weights = np.maximum(2.0 + 20.0 * np.log10(np.maximum(ra, 1e-50)), -80.0)
    expected = ((db + weights[:, None]).mean(axis=0) + 80.0) / 80.0

    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=2e-4)


def test_mfcc_full_chain_matches_oracle(rng):
    """End-to-end mfcc vs an independent rebuild: torch power STFT ->
    per-band triangle Slaney mel filterbank (scalar-style construction)
    -> power_to_db -> scipy ortho DCT-II, first n_mfcc rows (reference
    data/utils/mfcc_extraction.py:6-13: librosa.feature.mfcc defaults,
    n_mels=128, htk=False, norm='slaney', dct type-2 ortho)."""
    import scipy.fft

    sr, n_fft, hop, n_mfcc, n_mels = 16000, 1024, 128, 16, 128
    t = np.arange(sr) / sr
    audio = (
        0.4 * np.sin(2 * np.pi * 330.0 * t)
        + 0.2 * np.sin(2 * np.pi * 990.0 * t)
        + 0.02 * rng.standard_normal(sr)
    ).astype(np.float32)

    ours = np.asarray(mfcc(jnp.asarray(audio)))

    # Slaney hz<->mel as scalar piecewise functions (independent of the
    # vectorized ramps construction in ops/mel.py)
    lin_slope, brk_hz, brk_mel = 200.0 / 3.0, 1000.0, 15.0
    logstep = np.log(6.4) / 27.0

    def hz2mel(f):
        return f / lin_slope if f < brk_hz else brk_mel + np.log(f / brk_hz) / logstep

    def mel2hz(m):
        return m * lin_slope if m < brk_mel else brk_hz * np.exp(logstep * (m - brk_mel))

    pts = [mel2hz(m) for m in np.linspace(hz2mel(0.0), hz2mel(sr / 2.0), n_mels + 2)]
    freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    fb = np.zeros((n_mels, len(freqs)))
    for i in range(n_mels):
        lo, ctr, hi = pts[i], pts[i + 1], pts[i + 2]
        tri = np.minimum((freqs - lo) / (ctr - lo), (hi - freqs) / (hi - ctr))
        fb[i] = np.maximum(0.0, tri) * 2.0 / (hi - lo)

    S = _torch_magnitude_stft(audio, n_fft, hop)  # (bins, frames)
    mel_power = fb @ (S**2)
    mel_db = 10.0 * np.log10(np.maximum(mel_power, 1e-10))
    mel_db = np.maximum(mel_db, mel_db.max() - 80.0)
    expected = scipy.fft.dct(mel_db, type=2, axis=0, norm="ortho")[:n_mfcc]

    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=5e-3)


def test_resample_preserves_tone():
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = np.asarray(resample_kaiser(jnp.asarray(x), sr_in, sr_out))
    assert y.shape == (16000,)
    t_out = np.arange(16000) / sr_out
    expected = np.sin(2 * np.pi * 440.0 * t_out)
    # ignore filter edge transients
    np.testing.assert_allclose(y[500:-500], expected[500:-500], atol=5e-3)


def test_resample_irrational_pair():
    y = np.asarray(resample_kaiser(jnp.zeros(44100), 44100, 16000))
    assert y.shape == (16000,)


def test_yin_tracks_sine():
    sr = 16000
    t = np.arange(4 * sr) / sr
    x = np.sin(2 * np.pi * 330.0 * t).astype(np.float32)
    f0, conf = yin_f0(jnp.asarray(x), sr)
    f0, conf = np.asarray(f0), np.asarray(conf)
    assert f0.shape == (1 + 4 * sr // 128,)
    mid = slice(10, -10)
    assert np.abs(np.median(f0[mid]) - 330.0) < 3.0
    assert conf[mid].mean() > 0.9


def test_yin_low_periodicity_on_noise(rng):
    x = rng.standard_normal(16000).astype(np.float32)
    _, conf = yin_f0(jnp.asarray(x), 16000)
    assert np.asarray(conf).mean() < 0.7


def test_cubic_upsample_interpolates_smoothly():
    from neural_waveshaping_synthesis_tpu.ops import cubic_upsample

    x = jnp.asarray(np.sin(np.linspace(0, 3, 40)).astype(np.float32))[None, :, None]
    up = np.asarray(cubic_upsample(x, 400))[0, :, 0]
    assert up.shape == (400,)
    # align_corners=False source positions: pos = (s+0.5)*in/out - 0.5
    pos = np.clip((np.arange(400) + 0.5) * 40 / 400 - 0.5, 0, 39)
    expected = np.sin(pos * 3 / 39)
    # Catmull-Rom through sparse sine samples tracks the true sine
    assert np.abs(up[20:-20] - expected[20:-20]).max() < 0.01


def test_ops_overlap_add_upsample_constant():
    from neural_waveshaping_synthesis_tpu.ops import overlap_add_upsample

    x = jnp.ones((1, 16, 1))
    out = np.asarray(overlap_add_upsample(x, window_size=64, hop_length=32))
    assert out.shape == (1, 16 * 32, 1)
    # interior of a constant signal OLA'd with 50%-overlap hann sums to ~1
    interior = out[0, 100:-100, 0]
    np.testing.assert_allclose(interior, interior.mean(), rtol=0.05)


def test_a_weighting_reference_values():
    from neural_waveshaping_synthesis_tpu.ops import a_weighting

    # IEC 61672 anchor points: 0 dB at 1 kHz, about -19.1 dB at 100 Hz
    w = np.asarray(a_weighting(jnp.asarray([1000.0, 100.0])))
    assert abs(w[0]) < 0.2
    assert abs(w[1] + 19.1) < 0.5


def test_pyin_hmm_resists_noise_bursts(rng):
    """pYIN's trough-prior + HMM must stay on pitch through noise bursts
    that derail plain YIN's frame-wise threshold rule."""
    from neural_waveshaping_synthesis_tpu.ops.f0 import pyin_f0

    sr = 16000
    t = np.arange(3 * sr) / sr
    x = 0.4 * np.sin(2 * np.pi * 330 * t).astype(np.float32)
    for s in range(0, 3 * sr, 4000):
        x[s:s + 400] += rng.standard_normal(400).astype(np.float32) * 0.6

    f0_y, _ = yin_f0(jnp.asarray(x), sr)
    f0_p, _ = pyin_f0(jnp.asarray(x), sr)
    off = lambda f: np.mean(np.abs(np.asarray(f)[5:-5] - 330.0) > 20.0)
    assert off(f0_p) < 0.10
    assert off(f0_p) < off(f0_y) / 2  # at least 2x fewer bad frames


def test_pyin_clean_sine_and_vibrato():
    from neural_waveshaping_synthesis_tpu.ops.f0 import pyin_f0

    sr = 16000
    t = np.arange(3 * sr) / sr
    xc = 0.4 * np.sin(2 * np.pi * 330 * t).astype(np.float32)
    f0c, conf = pyin_f0(jnp.asarray(xc), sr)
    assert abs(float(np.median(np.asarray(f0c)[5:-5])) - 330.0) < 1.0
    assert float(np.median(np.asarray(conf))) > 0.95

    fv = 440 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    xv = 0.4 * np.sin(2 * np.pi * np.cumsum(fv) / sr).astype(np.float32)
    f0v = np.asarray(pyin_f0(jnp.asarray(xv), sr)[0])
    true = fv[::128]
    n = min(len(f0v), len(true))
    err = 1200 * np.abs(np.log2(f0v[10:n - 10] / true[10:n - 10]))
    assert np.median(err) < 10.0  # within 10 cents through the vibrato
