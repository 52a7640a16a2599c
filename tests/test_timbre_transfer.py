"""Timbre-transfer pipeline tests (colab cell-15/18 parity semantics)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_waveshaping_synthesis_tpu.inference import (
    ControlAdjustments,
    adjust_controls,
    extract_features,
    stream_timbre_transfer,
    timbre_transfer,
)

CKPT = "/root/reference/checkpoints/nws/vn/last.ckpt"
needs_ckpt = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference checkpoint not available"
)


def test_adjust_controls_colab_arithmetic():
    f0 = np.array([100.0, 200.0, 300.0])
    conf = np.array([0.9, 0.1, 0.9])
    loud = np.array([0.5, 0.6, 0.2])
    mean = np.zeros((19, 1)); mean[0] = 100.0; mean[1] = 0.3
    std = np.ones((19, 1)); std[0] = 50.0; std[1] = 0.2

    adj = ControlAdjustments(
        octave_shift=1,
        loudness_scale=0.5,
        loudness_floor=0.3,
        pitch_conf_filter=0.5,
        loudness_conf_filter=0.5,
    )
    f0_hz, control = adjust_controls(f0, conf, loud, mean, std, adj)

    # pitch: gated by conf>0.5, then *2
    np.testing.assert_allclose(f0_hz, [200.0, 0.0, 600.0])
    # loudness: gated, floored (x*(x>f)-f), scaled, z-scored
    lf = np.array([0.5, 0.0, 0.2])
    floored = lf * (lf > 0.3) - 0.3
    expected_loud = (floored * 0.5 - 0.3) / 0.2
    np.testing.assert_allclose(control[:, 1], expected_loud, rtol=1e-6)
    # control f0 channel is normalized of the Hz output
    np.testing.assert_allclose(control[:, 0], (f0_hz - 100.0) / 50.0, rtol=1e-6)


def test_box_smoothing_width():
    from neural_waveshaping_synthesis_tpu.inference.timbre_transfer import _box_smooth

    x = np.zeros(11); x[5] = 1.0
    y = _box_smooth(x, 2)
    assert y.shape == x.shape
    np.testing.assert_allclose(y[3:8], 0.2, rtol=1e-6)
    assert y[2] == 0.0


def test_extract_features_shapes(rng):
    sr = 16000
    t = np.arange(2 * sr) / sr
    audio = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    a16, f0, conf, loud = extract_features(audio, sr)
    n = 1 + 2 * sr // 128
    assert f0.shape == conf.shape == loud.shape == (n,)
    assert abs(np.median(f0[10:-10]) - 440.0) < 5.0


def test_stream_timbre_transfer_tiny(rng):
    """The streaming timbre-transfer path (pipelined driver, carried
    state) runs end-to-end on arbitrary audio and reports honest
    cadence stats; output length/shape match the offline contract."""
    from test_training import tiny_model

    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    mean = np.zeros((19, 1)); mean[0] = 200.0; mean[1] = 0.3
    std = np.ones((19, 1)); std[0] = 100.0; std[1] = 0.2

    sr = 4000
    t = np.arange(2 * sr) / sr
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    out, stats = stream_timbre_transfer(
        model, params, audio, sr, mean, std,
        buffer_size=128,       # 4 frames of the tiny model's 32-hop
        pipeline_depth=2,
    )
    n_frames = 1 + len(audio) // 128  # extract_features' 128-sample hop
    assert out.shape == (n_frames * model.control_hop,)
    assert np.isfinite(out).all()
    assert stats["n_buffers"] == -(-n_frames // 4)
    assert stats["pipeline_depth"] == 2
    assert stats["cadence_p50_ms"] >= 0.0
    assert stats["cadence_p95_ms"] >= stats["cadence_p50_ms"]
    assert stats["first_buffer_latency_ms"] > 0.0
    assert stats["x_realtime"] > 0.0
    # a voiced input through a random-init model still synthesizes energy
    assert out.std() > 0.0


def test_stream_timbre_transfer_rejects_bad_buffer(rng):
    from test_training import tiny_model

    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    mean, std = np.zeros((19, 1)), np.ones((19, 1))
    audio = np.zeros(4000, np.float32)
    with pytest.raises(ValueError, match="multiple of control_hop"):
        stream_timbre_transfer(
            model, params, audio, 4000, mean, std, buffer_size=100
        )


@needs_ckpt
def test_timbre_transfer_end_to_end():
    from neural_waveshaping_synthesis_tpu.convert import load_reference_checkpoint
    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping

    model = NeuralWaveshaping()
    params, _, mean, std = load_reference_checkpoint(CKPT)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    sr = 16000
    t = np.arange(2 * sr) / sr
    audio = (0.4 * np.sin(2 * np.pi * 330 * t) * (0.5 + 0.5 * np.sin(np.pi * t))).astype(
        np.float32
    )
    # the vn dataset stats center f0 at ~508 Hz; shift the 330 Hz source
    # up an octave into the violin's range (the colab slider's purpose)
    out, speed = timbre_transfer(
        model, params, audio, sr, mean, std,
        ControlAdjustments(octave_shift=1, loudness_scale=2.0),
        frame_bucket=64,
    )
    n_frames = 1 + 2 * sr // 128
    assert out.shape == (n_frames * 128,)
    assert np.isfinite(out).all()
    assert speed > 0
    # output should carry the source fundamental; ignore the DC hump the
    # uniform-noise excitation contributes (reference-parity quirk)
    spec = np.abs(np.fft.rfft(out[8000:24000] * np.hanning(16000)))
    freqs = np.fft.rfftfreq(16000, 1 / 16000)
    spec[freqs < 50.0] = 0.0
    peak = freqs[np.argmax(spec)]
    assert any(abs(peak - h * 660.0) < 15.0 for h in (1, 2, 3)), peak
