"""YIN fundamental-frequency estimation in pure JAX.

A dependency-free F0 extractor that works out of the box (the CREPE
port in ``models/crepe.py`` is the higher-accuracy path but needs a
converted pretrained weight file). Serves the role of the reference's
pYIN alternative (``data/utils/f0_extraction.py:60-92``), rebuilt
TPU-style: every frame's difference function is computed at once via
batched FFT autocorrelation, so a whole corpus pitch-tracks as one XLA
program instead of a per-frame Python loop.

Returns (f0, periodicity) per frame, mirroring the (f0, confidence)
contract of the CREPE extractor so the two are interchangeable in the
preprocessing pipeline.
"""
from typing import Tuple

import jax
import jax.numpy as jnp

from .stft import frame_signal


def _difference_function(frames: jnp.ndarray, tau_max: int) -> jnp.ndarray:
    """YIN eq. (6) difference function d(tau) for ``(..., F, W)`` frames,
    computed via FFT autocorrelation (O(W log W) per frame)."""
    w = frames.shape[-1]
    n = 1
    while n < 2 * w:
        n *= 2
    spec = jnp.fft.rfft(frames, n=n, axis=-1)
    acf = jnp.fft.irfft(spec * jnp.conj(spec), n=n, axis=-1)[..., :tau_max]

    # cumulative energy terms: sum_{j=0}^{W-1-tau} x_j^2 and x_{j+tau}^2
    sq = jnp.square(frames)
    csum = jnp.cumsum(sq, axis=-1)
    total = csum[..., -1:]
    tau = jnp.arange(tau_max)
    # energy of x[0 : W - tau]
    e_head = jnp.take(csum, w - 1 - tau, axis=-1)
    # energy of x[tau : W]
    e_tail = total - jnp.where(tau > 0, jnp.take(csum, tau - 1, axis=-1), 0.0)
    return e_head + e_tail - 2.0 * acf


def _cmndf(d: jnp.ndarray) -> jnp.ndarray:
    """Cumulative mean-normalized difference (YIN eq. 8); d'(0) = 1."""
    tau = jnp.arange(1, d.shape[-1])
    running = jnp.cumsum(d[..., 1:], axis=-1)
    normed = d[..., 1:] * tau / jnp.maximum(running, 1e-12)
    return jnp.concatenate([jnp.ones_like(d[..., :1]), normed], axis=-1)


def yin_f0(
    audio: jnp.ndarray,
    sample_rate: float = 16000.0,
    frame_length: int = 1024,
    hop_length: int = 128,
    fmin: float = 50.0,
    fmax: float = 2000.0,
    threshold: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """YIN pitch track of ``(..., T)`` audio.

    Frames are centered (reflect padding), giving 1 + T//hop frames —
    the same frame grid as the CREPE extractor and loudness.

    Returns:
      f0: ``(..., n_frames)`` Hz estimate (best candidate even when
        unvoiced — consumers gate on periodicity, as the reference's
        confidence-threshold segment filter does).
      periodicity: ``(..., n_frames)`` in [0, 1]; 1 - d'(tau*).
    """
    pad = [(0, 0)] * (audio.ndim - 1) + [(frame_length // 2, frame_length // 2)]
    padded = jnp.pad(audio, pad, mode="reflect")
    frames = frame_signal(padded, frame_length, hop_length)  # (..., F, W)

    tau_min = max(int(sample_rate / fmax), 1)
    tau_max = min(int(sample_rate / fmin) + 1, frame_length - 1)

    d = _difference_function(frames, tau_max + 1)
    cm = _cmndf(d)  # (..., F, tau_max+1)

    lags = jnp.arange(tau_max + 1)
    in_range = (lags >= tau_min) & (lags <= tau_max)
    masked = jnp.where(in_range, cm, jnp.inf)

    # absolute-threshold rule: the first tau that is below threshold AND a
    # local trough (i.e. we descend to the bottom of the first qualifying
    # dip rather than stopping at the threshold crossing); fall back to
    # the global minimum when nothing dips below threshold.
    next_cm = jnp.concatenate(
        [masked[..., 1:], jnp.full_like(masked[..., :1], jnp.inf)], axis=-1
    )
    is_trough = masked <= next_cm
    below = (masked < threshold) & is_trough
    any_below = jnp.any(below, axis=-1)
    first_below = jnp.argmax(below, axis=-1)
    global_min = jnp.argmin(masked, axis=-1)
    tau_star = jnp.where(any_below, first_below, global_min)

    # parabolic interpolation around tau_star for sub-sample precision
    tm1 = jnp.clip(tau_star - 1, 0, tau_max)
    tp1 = jnp.clip(tau_star + 1, 0, tau_max)
    y0 = jnp.take_along_axis(cm, tm1[..., None], axis=-1)[..., 0]
    y1 = jnp.take_along_axis(cm, tau_star[..., None], axis=-1)[..., 0]
    y2 = jnp.take_along_axis(cm, tp1[..., None], axis=-1)[..., 0]
    denom = y0 - 2.0 * y1 + y2
    delta = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (y0 - y2) / jnp.where(denom == 0, 1.0, denom), 0.0
    )
    delta = jnp.clip(delta, -0.5, 0.5)
    tau_refined = tau_star.astype(jnp.float32) + delta
    tau_refined = jnp.clip(tau_refined, tau_min, tau_max)

    f0 = sample_rate / tau_refined
    periodicity = jnp.clip(1.0 - y1, 0.0, 1.0)
    return f0, periodicity


def pyin_f0(
    audio: jnp.ndarray,
    sample_rate: float = 16000.0,
    frame_length: int = 1024,
    hop_length: int = 128,
    fmin: float = 65.0,
    fmax: float = 2000.0,
    beta_a: float = 2.0,
    beta_b: float = 18.0,
    viterbi_window: int = 12,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Probabilistic YIN (Mauch & Dixon): per-frame pitch-candidate
    distributions from the cumulative mean-normalized difference,
    decoded with an HMM (Viterbi over 360 log-spaced 20-cent bins — the
    CREPE pitch grid).

    Observation model: YIN's absolute-threshold rule picks the FIRST
    lag whose d' dips below a threshold theta; pYIN marginalizes over a
    Beta(a, b) prior on theta. A candidate at lag L is the first dip
    below theta exactly when d'(L) < theta <= (running min of d' over
    smaller lags), so its probability mass is
    CDF(prefix_min) - CDF(d') — computed for every bin with one
    cumulative-min over ascending lag. This keeps YIN's
    prefer-the-shortest-lag behavior (no subharmonic collapse) while
    the HMM's band-limited transition prior removes frame-wise octave
    hops on noisy/transient frames.

    Audio is 1-D (per-file preprocessing). Returns (f0, periodicity)
    at 1 + T//hop frames, like ``yin_f0``.

    Measured accuracy vs synthetic ground truth (librosa pYIN itself is
    unavailable in the build environment; fixtures in
    tests/test_pyin_golden.py enforce these with ~50% headroom):

      steady tones     110-440 Hz: median <=0.4 cents; 880 Hz: 2.5;
                       1760 Hz: 10.2 (integer-lag quantization — the
                       period is ~9 samples at 16 kHz; librosa's pYIN
                       has the same lag-domain resolution limit)
      vibrato          6 Hz +-50 cents @440: median 7.5 / p90 10.8 cents
      tone+noise       20/10/5 dB SNR: median 0.3 / 1.1 / 3.4 cents,
                       mean confidence 0.98 / 0.90 / 0.76
      glissando        one octave over 3 s: median 0.28 cents
      voicing          unvoiced (noise, silence) confidence ~0.14 vs
                       >=0.76 voiced — a 0.5 gate separates cleanly
      subharmonics     440 Hz + 220 Hz subharmonic: ONE coherent octave
                       for the whole clip (0.000 octave-hop fraction);
                       decodes 440 at subharmonic amplitude <=0.08x,
                       locks to the true 220 period at 0.15x
    """
    import numpy as _np
    from jax.scipy.special import betainc

    from ..models.crepe import (
        N_BINS,
        bins_to_cents,
        cents_to_frequency,
        viterbi_decode,
    )

    pad = [(0, 0)] * (audio.ndim - 1) + [(frame_length // 2, frame_length // 2)]
    padded = jnp.pad(audio, pad, mode="reflect")
    frames = frame_signal(padded, frame_length, hop_length)  # (F, W)

    tau_min = max(int(sample_rate / fmax), 2)
    tau_max = min(int(sample_rate / fmin) + 1, frame_length - 2)
    d = _difference_function(frames, tau_max + 2)
    cm = _cmndf(d)  # (F, tau_max+2)

    # candidates = LOCAL MINIMA of d' over integer lags (pYIN's trough
    # set); everything else gets +inf so it neither takes mass nor
    # perturbs the running minimum.
    lags = jnp.arange(tau_min, tau_max + 1)
    center = cm[:, tau_min : tau_max + 1]
    left = cm[:, tau_min - 1 : tau_max]
    right = cm[:, tau_min + 1 : tau_max + 2]
    is_trough = (center <= left) & (center < right)
    cand = jnp.where(is_trough, center, jnp.inf)

    # threshold-sweep mass over troughs, ascending lag: a trough is
    # YIN's pick exactly when d' < theta <= (min over earlier troughs),
    # so its Beta(a,b)-prior mass is CDF(prefix_min) - CDF(d').
    prefix_min = jnp.concatenate(
        [jnp.full_like(cand[:, :1], jnp.inf),
         jax.lax.cummin(cand, axis=1)[:, :-1]],
        axis=1,
    )
    cdf = lambda x: betainc(beta_a, beta_b, jnp.clip(x, 0.0, 1.0))
    mass = jnp.maximum(cdf(prefix_min) - cdf(cand), 0.0)  # (F, n_lags)

    # map integer lags onto the 20-cent bin grid with a static one-hot
    # matmul (static lags -> host-built matrix; no runtime scatter).
    lag_freqs = sample_rate / _np.arange(tau_min, tau_max + 1)
    lag_bins = _np.clip(
        _np.round(
            (1200.0 * _np.log2(lag_freqs / 10.0) - 1997.3794084376191) / 20.0
        ).astype(_np.int64),
        0,
        N_BINS - 1,
    )
    onehot = _np.zeros((lag_bins.shape[0], N_BINS), _np.float32)
    onehot[_np.arange(lag_bins.shape[0]), lag_bins] = 1.0
    probs = jnp.dot(mass, jnp.asarray(onehot), preferred_element_type=jnp.float32)

    bins = viterbi_decode(probs, window=viterbi_window)

    # refine to sub-bin precision: parabolic interpolation of d' around
    # the integer lag nearest the decoded bin.
    bin_lag = jnp.clip(
        jnp.round(
            sample_rate / cents_to_frequency(bins_to_cents(bins.astype(jnp.float32)))
        ).astype(jnp.int32),
        tau_min,
        tau_max,
    )
    y0 = jnp.take_along_axis(cm, (bin_lag - 1)[:, None], axis=-1)[:, 0]
    y1 = jnp.take_along_axis(cm, bin_lag[:, None], axis=-1)[:, 0]
    y2 = jnp.take_along_axis(cm, (bin_lag + 1)[:, None], axis=-1)[:, 0]
    denom = y0 - 2.0 * y1 + y2
    delta = jnp.where(
        jnp.abs(denom) > 1e-12,
        0.5 * (y0 - y2) / jnp.where(denom == 0, 1.0, denom),
        0.0,
    )
    delta = jnp.clip(delta, -0.5, 0.5)
    f0 = sample_rate / (bin_lag.astype(jnp.float32) + delta)

    periodicity = jnp.clip(1.0 - y1, 0.0, 1.0)
    return f0, periodicity
