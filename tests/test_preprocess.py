"""End-to-end preprocessing pipeline tests (wav -> shards) using the YIN
extractor, plus unit checks for segmentation/filtering/stats."""
import os

import numpy as np
import pytest
from scipy.io import wavfile

import jax

from neural_waveshaping_synthesis_tpu.data import GeneralDataModule
from neural_waveshaping_synthesis_tpu.data.preprocess import (
    convert_to_float32_audio,
    create_dataset,
    extract_f0_with_yin,
    filter_segments,
    linear_interpolation,
    make_monophonic,
    preprocess_single_audio_file,
    segment_signal,
)


def test_convert_int16():
    x = np.array([-32767, 0, 32767], np.int16)
    f = convert_to_float32_audio(x)
    assert f.dtype == np.float32
    np.testing.assert_allclose(f, [-1.0, 0.0, 1.0], atol=1e-4)


def test_make_monophonic_strategies():
    stereo = np.stack([np.ones(10), np.zeros(10)], axis=1)  # (T, 2)
    assert make_monophonic(stereo, "keep_left").sum() == 10
    assert make_monophonic(stereo, "keep_right").sum() == 0
    assert make_monophonic(stereo, "sum").sum() == 5
    assert make_monophonic(np.ones(7)).shape == (7,)


def test_segment_signal_orientation():
    x = np.arange(10.0)
    seg = segment_signal(x, sample_rate=1.0, segment_length_in_seconds=4,
                         hop_length_in_seconds=2)
    assert seg.shape == (4, 4)  # (seg_len, n_segments)
    np.testing.assert_array_equal(seg[:, 1], [2, 3, 4, 5])


def test_filter_segments():
    conf = np.array([[0.9, 0.1], [0.9, 0.1]])  # (len 2, 2 segments)
    audio = np.arange(8.0).reshape(4, 2)
    mfcc = np.arange(16.0).reshape(2, 4, 2)
    fa, fm = filter_segments(0.5, conf, (audio, mfcc))
    assert fa.shape == (4, 1) and fm.shape == (2, 4, 1)
    np.testing.assert_array_equal(fa[:, 0], audio[:, 0])


def test_linear_interpolation_crop():
    sig = np.array([0.0, 1.0, 2.0])
    out = linear_interpolation(sig, window_length=4, hop_length=2,
                               original_length=6)
    assert out.shape == (6,)


@pytest.fixture
def wav_corpus(tmp_path):
    """Two 10-s wavs: a harmonic tone (keeps segments) and noise-with-
    silence (fails the confidence filter)."""
    sr = 16000
    t = np.arange(10 * sr) / sr
    tone = (
        0.5 * np.sin(2 * np.pi * 330 * t)
        + 0.2 * np.sin(2 * np.pi * 660 * t)
    ).astype(np.float32)
    wavfile.write(tmp_path / "tone.wav", sr, (tone * 32767).astype(np.int16))
    noise = (np.random.default_rng(0).standard_normal(10 * sr) * 0.02).astype(
        np.float32
    )
    wavfile.write(tmp_path / "noise.wav", sr, (noise * 32767).astype(np.int16))
    return str(tmp_path)


def test_preprocess_single_file_shapes(wav_corpus):
    from functools import partial

    from neural_waveshaping_synthesis_tpu.data.preprocess import (
        extract_perceptual_loudness,
    )

    segments = preprocess_single_audio_file(
        os.path.join(wav_corpus, "tone.wav"),
        control_decimation_factor=128,
        f0_extractor=extract_f0_with_yin,
        # the gin config binds the 125 Hz frame grid (n_fft 1024, hop 128);
        # bound explicitly here since this unit test bypasses gin
        loudness_extractor=partial(
            extract_perceptual_loudness, n_fft=1024, hop_length=128
        ),
        hop_length_in_seconds=4.0,
        verbose=False,
    )
    audio_segs, f0_segs, conf_segs, loud_segs, mfcc_segs = segments
    assert len(audio_segs) >= 1
    assert audio_segs[0].shape == (4 * 16000,)
    assert f0_segs[0].shape == (500,)
    assert loud_segs[0].shape == (500,)
    assert mfcc_segs[0].shape == (16, 500)
    # yin should find ~330 Hz on the tone
    assert abs(np.median(f0_segs[0]) - 330.0) < 5.0
    assert conf_segs[0].mean() > 0.85


def test_create_dataset_end_to_end(wav_corpus, tmp_path, monkeypatch):
    from neural_waveshaping_synthesis_tpu import minigin

    minigin.clear_config()
    minigin.parse_config(
        "preprocess_audio.f0_extractor = @extract_f0_with_yin\n"
        "preprocess_audio.hop_length_in_seconds = 2\n"
        "preprocess_audio.normalise_audio = True\n"
        "preprocess_audio.verbose = False\n"
        "extract_perceptual_loudness.n_fft = 1024\n"
        "extract_perceptual_loudness.hop_length = 128\n"
    )
    out = str(tmp_path / "out")
    create_dataset(
        [os.path.join(wav_corpus, "tone.wav"), os.path.join(wav_corpus, "noise.wav")],
        out,
        split_proportions=(0.5, 0.25, 0.25),
    )
    minigin.clear_config()

    assert os.path.exists(os.path.join(out, "data_mean.npy"))
    assert not os.path.exists(os.path.join(out, "temp"))
    mean = np.load(os.path.join(out, "data_mean.npy"))
    std = np.load(os.path.join(out, "data_std.npy"))
    assert mean.shape == (19, 1) and std.shape == (19, 1)
    # f0 mean should be near the tone's 330 Hz (noise file got filtered out)
    assert 250 < mean[0, 0] < 400

    n_total = sum(
        len(os.listdir(os.path.join(out, s, "audio")))
        for s in ("train", "val", "test")
    )
    assert n_total >= 3  # 10 s tone, 4 s windows hopped by 2 s -> 4 segments

    # the produced dataset round-trips through the DataModule + model
    dm = GeneralDataModule(out, batch_size=1)
    batch = next(iter(dm.train_batches(jax.random.PRNGKey(0))))
    assert batch["audio"].shape[1] == 64000
    assert batch["control"].shape[1:] == (500, 19)
    # z-scored controls: roughly centered
    assert abs(batch["control"][..., 0].mean()) < 3.0
    # denormalized f0 back to Hz
    assert 200 < batch["f0"].mean() < 500
