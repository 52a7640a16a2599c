"""pYIN golden-accuracy fixtures (VERDICT r1 #8).

The reference's alternative extractor is librosa pYIN
(reference data/utils/f0_extraction.py:60-92); librosa is not
installable here, so the contract is validated against SYNTHETIC
ground truth instead: signals whose exact f0 track is known by
construction. The bounds below are the measured behavior (see the
table in ops/f0.py pyin_f0's docstring) with ~50% headroom; a
regression beyond them means the threshold-sweep observation model or
the HMM decode changed materially.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from neural_waveshaping_synthesis_tpu.ops.f0 import pyin_f0

SR = 16000
T = 3 * SR
_t = np.arange(T) / SR


def _track(x):
    f0, conf = pyin_f0(jnp.asarray(x.astype(np.float32)), SR)
    return np.asarray(f0), np.asarray(conf)


def _cents(f, true):
    n = min(len(f), len(true))
    return 1200 * np.abs(np.log2(f[:n] / true[:n]))


@pytest.mark.parametrize(
    "hz,med_bound,p90_bound",
    [
        (110, 1.0, 1.5),   # measured 0.01 / 0.02 cents
        (220, 1.0, 1.5),   # measured 0.11 / 0.12
        (440, 1.0, 1.5),   # measured 0.41 / 0.42
        (880, 4.0, 5.0),   # measured 2.49 / 2.51 (lag quantization)
        (1760, 15.0, 16.0),  # measured 10.2 / 10.2 (9-sample lag)
    ],
)
def test_steady_tone_accuracy(hz, med_bound, p90_bound):
    x = 0.4 * np.sin(2 * np.pi * hz * _t)
    f0, conf = _track(x)
    e = _cents(f0, np.full_like(f0, hz))[5:-5]
    assert np.median(e) < med_bound
    assert np.percentile(e, 90) < p90_bound
    assert conf[5:-5].mean() > 0.95


def test_vibrato_tracking():
    """6 Hz, +-50-cent vibrato: measured med 7.5 / p90 10.8 cents (the
    20-cent HMM grid quantizes the moving target; parabolic lag
    refinement recovers most of it)."""
    fv = 440 * 2 ** (0.05 / 1.2 * np.sin(2 * np.pi * 6 * _t))
    x = 0.4 * np.sin(2 * np.pi * np.cumsum(fv) / SR)
    f0, conf = _track(x)
    e = _cents(f0, fv[::128])[10:-10]
    assert np.median(e) < 12.0
    assert np.percentile(e, 90) < 18.0


@pytest.mark.parametrize(
    "snr_db,med_bound,conf_min",
    [(20, 1.0, 0.95), (10, 3.0, 0.85), (5, 8.0, 0.6)],
)
def test_harmonic_tone_in_noise(snr_db, med_bound, conf_min):
    """10-harmonic 330 Hz tone + white noise: accuracy and confidence
    must degrade gracefully (measured med cents 0.26 / 1.07 / 3.38 and
    conf 0.98 / 0.90 / 0.76 at 20 / 10 / 5 dB SNR)."""
    rng = np.random.default_rng(0)
    sig = np.zeros(T)
    for k in range(1, 11):
        sig += np.sin(2 * np.pi * 330 * k * _t) / k
    sig /= np.abs(sig).max()
    n = rng.standard_normal(T)
    n *= np.sqrt((sig**2).mean() / (n**2).mean() / 10 ** (snr_db / 10))
    f0, conf = _track(sig + n)
    e = _cents(f0, np.full_like(f0, 330.0))[5:-5]
    assert np.median(e) < med_bound
    assert conf[5:-5].mean() > conf_min


def test_glissando_no_lag():
    """One-octave exponential glissando over 3 s: the HMM transition
    prior must not smear the moving pitch (measured med 0.28 cents)."""
    fg = 220 * 2 ** (_t / 3)
    x = 0.4 * np.sin(2 * np.pi * np.cumsum(fg) / SR)
    f0, _ = _track(x)
    e = _cents(f0, fg[::128])[10:-10]
    assert np.median(e) < 2.0


def test_voicing_separation():
    """Confidence must separate voiced from unvoiced cleanly: noise-only
    and near-silence both measured ~0.14 mean confidence vs >=0.76 on
    every voiced case — a 0.5 gate (the pipeline's fill_na /
    confidence-filter threshold regime) is unambiguous."""
    rng = np.random.default_rng(1)
    _, conf_noise = _track(0.1 * rng.standard_normal(T))
    _, conf_silence = _track(1e-6 * rng.standard_normal(T))
    assert conf_noise[5:-5].mean() < 0.3
    assert conf_silence[5:-5].mean() < 0.3
