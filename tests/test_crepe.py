"""CREPE-JAX tests: architecture shapes, torchcrepe layout-conversion
parity (random weights through a stock-torch oracle), Viterbi decoding,
and cents refinement."""
import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from neural_waveshaping_synthesis_tpu.models import crepe


def test_apply_shapes_random_weights():
    model = crepe.Crepe(capacity="tiny")
    params = model.init(jax.random.PRNGKey(0))
    out = model.apply(params, jnp.zeros((3, 1024)))
    assert out.shape == (3, 360)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_frame_audio_normalization(rng):
    audio = rng.standard_normal(4096).astype(np.float32) * 3.0 + 1.0
    frames = crepe.frame_audio(jnp.asarray(audio), 128)
    assert frames.shape == (1 + 4096 // 128, 1024)
    f = np.asarray(frames)
    np.testing.assert_allclose(f.mean(-1), 0.0, atol=1e-4)
    # interior frames (no zero padding) have unit std
    np.testing.assert_allclose(f[5:-5].std(-1), 1.0, atol=1e-3)


def _make_torch_state(rng, capacity_mult):
    """Random weights in torchcrepe's state-dict layout."""
    filters = [capacity_mult * f for f in (32, 4, 4, 4, 8, 16)]
    widths = (512, 64, 64, 64, 64, 64)
    sd = {}
    in_ch = 1
    for i, (out_ch, w) in enumerate(zip(filters, widths), start=1):
        sd[f"conv{i}.weight"] = torch.tensor(
            rng.standard_normal((out_ch, in_ch, w, 1)).astype(np.float32) * 0.05
        )
        sd[f"conv{i}.bias"] = torch.tensor(
            rng.standard_normal(out_ch).astype(np.float32) * 0.05
        )
        sd[f"conv{i}_BN.weight"] = torch.tensor(
            1.0 + 0.1 * rng.standard_normal(out_ch).astype(np.float32)
        )
        sd[f"conv{i}_BN.bias"] = torch.tensor(
            0.1 * rng.standard_normal(out_ch).astype(np.float32)
        )
        sd[f"conv{i}_BN.running_mean"] = torch.tensor(
            0.1 * rng.standard_normal(out_ch).astype(np.float32)
        )
        sd[f"conv{i}_BN.running_var"] = torch.tensor(
            (1.0 + 0.1 * rng.random(out_ch)).astype(np.float32)
        )
        in_ch = out_ch
    sd["classifier.weight"] = torch.tensor(
        rng.standard_normal((360, 4 * filters[-1])).astype(np.float32) * 0.05
    )
    sd["classifier.bias"] = torch.tensor(
        rng.standard_normal(360).astype(np.float32) * 0.05
    )
    return sd


def _torch_crepe_forward(sd, x):
    """Stock-torch oracle of the torchcrepe graph (conv2d + relu + BN eval
    + maxpool(2,1), keras-'same' pads, time-major flatten, sigmoid)."""
    pads = [(254, 254)] + [(31, 32)] * 5
    strides = [(4, 1)] + [(1, 1)] * 5
    h = x[:, None, :, None]  # (B, 1, W, 1)
    with torch.no_grad():
        for i in range(1, 7):
            p = pads[i - 1]
            h = F.pad(h, (0, 0, p[0], p[1]))
            h = F.conv2d(h, sd[f"conv{i}.weight"], sd[f"conv{i}.bias"], strides[i - 1])
            h = F.relu(h)
            h = F.batch_norm(
                h,
                sd[f"conv{i}_BN.running_mean"],
                sd[f"conv{i}_BN.running_var"],
                sd[f"conv{i}_BN.weight"],
                sd[f"conv{i}_BN.bias"],
                training=False,
                eps=1e-3,
            )
            h = F.max_pool2d(h, (2, 1), (2, 1))
        h = h.permute(0, 2, 1, 3).reshape(h.shape[0], -1)
        return torch.sigmoid(
            F.linear(h, sd["classifier.weight"], sd["classifier.bias"])
        )


def _make_torch_tiny_state(rng):
    return _make_torch_state(rng, 4)


def test_conversion_matches_torch_oracle(rng):
    sd = _make_torch_tiny_state(rng)
    params = jax.tree_util.tree_map(
        jnp.asarray, crepe.convert_torchcrepe_state_dict(sd)
    )
    model = crepe.Crepe(capacity="tiny")
    x = rng.standard_normal((4, 1024)).astype(np.float32)
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    ref = _torch_crepe_forward(sd, torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


def test_viterbi_follows_ridge(rng):
    """A noisy posteriorgram with a slowly drifting ridge: Viterbi must
    track it where frame-wise argmax jumps to noise spikes."""
    t, drift = 200, 0.25
    bins = (100 + drift * np.arange(t)).astype(int)
    probs = rng.random((t, 360)).astype(np.float32) * 0.3
    probs[np.arange(t), bins] = 0.9
    # inject hard outlier frames that argmax would chase
    outliers = rng.choice(t, 20, replace=False)
    probs[outliers, 300] = 1.0

    path = np.asarray(crepe.viterbi_decode(jnp.asarray(probs)))
    am = np.asarray(crepe.argmax_decode(jnp.asarray(probs)))
    viterbi_err = np.abs(path - bins).mean()
    argmax_err = np.abs(am - bins).mean()
    assert viterbi_err < 1.0, viterbi_err
    assert argmax_err > viterbi_err  # argmax chased the outliers


def test_viterbi_matches_bruteforce_dp(rng):
    """The lax.scan Viterbi with backtrace must equal an independent
    numpy dynamic program on random posteriorgrams."""
    t, n = 40, 360
    probs = rng.random((t, n)).astype(np.float32)
    path = np.asarray(crepe.viterbi_decode(jnp.asarray(probs)))

    # brute-force DP with the same transition construction
    diff = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]).astype(np.float64)
    trans = np.maximum(12 - diff, 0.0)
    log_trans = np.log(trans / trans.sum(1, keepdims=True) + 1e-20)
    obs = probs / np.maximum(probs.sum(-1, keepdims=True), 1e-12)
    log_obs = np.log(obs + 1e-20)

    delta = log_obs[0] - np.log(n)
    ptrs = np.zeros((t - 1, n), np.int64)
    for i in range(1, t):
        scores = delta[:, None] + log_trans
        ptrs[i - 1] = scores.argmax(0)
        delta = scores.max(0) + log_obs[i]
    ref = np.zeros(t, np.int64)
    ref[-1] = delta.argmax()
    for i in range(t - 2, -1, -1):
        ref[i] = ptrs[i, ref[i + 1]]

    np.testing.assert_array_equal(path, ref)


def test_local_average_cents_single_peak():
    probs = np.zeros((1, 360), np.float32)
    probs[0, 150] = 1.0
    cents = crepe.local_average_cents(jnp.asarray(probs), jnp.asarray([150]))
    assert float(cents[0]) == pytest.approx(crepe.bins_to_cents(150))


def test_bin_frequency_roundtrip():
    freqs = np.array([55.0, 440.0, 1000.0])
    bins = crepe.frequency_to_bins(jnp.asarray(freqs))
    back = crepe.cents_to_frequency(crepe.bins_to_cents(bins))
    np.testing.assert_allclose(np.asarray(back), freqs, rtol=1e-6)


def test_predict_random_weights_shapes():
    """predict() plumbing: framing, bucketing, masking, decode — with
    random weights the values are meaningless but shapes/finiteness and
    the fmin/fmax mask contract must hold."""
    model = crepe.Crepe(capacity="tiny")
    params = model.init(jax.random.PRNGKey(0))
    audio = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    f0, conf = crepe.predict(model, params, audio, decoder="viterbi")
    assert f0.shape == conf.shape == (1 + 16000 // 128,)
    assert np.isfinite(f0).all()
    assert (f0 >= 50.0 - 15).all() and (f0 <= 2000.0 + 600).all()  # mask ± refinement


# ---------------------------------------------------------------------------
# predict-level parity: the WHOLE pipeline (frame -> conv stack -> mask ->
# Viterbi -> cents refinement -> periodicity) against an independent
# torch+numpy oracle, at FULL capacity (VERDICT r1 #3). Random weights:
# values are arbitrary but every stage's arithmetic must agree.
# ---------------------------------------------------------------------------
def _oracle_predict(sd, audio, hop=128, fmin=50.0, fmax=2000.0):
    """torchcrepe.predict's documented pipeline, re-derived with stock
    torch (CNN) + numpy (framing, Viterbi DP, refinement)."""
    n_frames = 1 + len(audio) // hop
    padded = np.pad(audio, (512, 512))
    frames = np.stack(
        [padded[i * hop : i * hop + 1024] for i in range(n_frames)]
    ).astype(np.float32)
    mean = frames.mean(-1, keepdims=True)
    std = np.maximum(frames.std(-1, keepdims=True), 1e-10)
    frames = (frames - mean) / std

    probs = _torch_crepe_forward(sd, torch.tensor(frames)).numpy()

    bins_all = np.arange(360)
    freqs = 10 * 2.0 ** ((20.0 * bins_all + 1997.3794084376191) / 1200.0)
    probs = probs * ((freqs >= fmin) & (freqs <= fmax))

    # Viterbi (numpy DP, same construction as the production scan)
    t, n = probs.shape
    diff = np.abs(bins_all[:, None] - bins_all[None, :]).astype(np.float64)
    trans = np.maximum(12 - diff, 0.0)
    log_trans = np.log(trans / trans.sum(1, keepdims=True) + 1e-20)
    obs = probs / np.maximum(probs.sum(-1, keepdims=True), 1e-12)
    log_obs = np.log(obs + 1e-20)
    delta = log_obs[0] - np.log(n)
    ptrs = np.zeros((t - 1, n), np.int64)
    for i in range(1, t):
        scores = delta[:, None] + log_trans
        ptrs[i - 1] = scores.argmax(0)
        delta = scores.max(0) + log_obs[i]
    path = np.zeros(t, np.int64)
    path[-1] = delta.argmax()
    for i in range(t - 2, -1, -1):
        path[i] = ptrs[i, path[i + 1]]

    # local weighted average cents + periodicity at the decoded bin
    idx = np.clip(path[:, None] + np.arange(-4, 5)[None, :], 0, 359)
    w = np.take_along_axis(probs, idx, axis=-1)
    cents_grid = 20.0 * idx + 1997.3794084376191
    cents = (w * cents_grid).sum(-1) / np.maximum(w.sum(-1), 1e-12)
    f0 = 10 * 2.0 ** (cents / 1200.0)
    periodicity = probs[np.arange(t), path]
    return f0, periodicity


def test_predict_matches_oracle_full_capacity(rng):
    """End-to-end predict() parity at the reference's capacity ('full',
    ~22M params): the JAX pipeline must reproduce the oracle's f0 track
    and periodicity on real audio-like input. Short clip (0.1 s, 13
    frames) keeps the full-capacity CPU convs tractable."""
    sd = _make_torch_state(rng, 32)
    params = jax.tree_util.tree_map(
        jnp.asarray, crepe.convert_torchcrepe_state_dict(sd)
    )
    model = crepe.Crepe(capacity="full")

    t = np.arange(1600) / 16000.0
    audio = (
        0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(1600)
    ).astype(np.float32)

    f0, conf = crepe.predict(model, params, audio, frame_bucket=16)
    f0_ref, conf_ref = _oracle_predict(sd, audio)

    assert f0.shape == f0_ref.shape == (1 + 1600 // 128,)
    np.testing.assert_allclose(f0, f0_ref, rtol=1e-3)
    np.testing.assert_allclose(conf, conf_ref, rtol=1e-3, atol=1e-5)


def test_predict_matches_oracle_tiny_long(rng):
    """Same parity on a longer clip at tiny capacity: exercises frame
    bucketing (pad beyond one bucket), batch chunking, and a Viterbi
    long enough to have real path structure."""
    sd = _make_torch_tiny_state(rng)
    params = jax.tree_util.tree_map(
        jnp.asarray, crepe.convert_torchcrepe_state_dict(sd)
    )
    model = crepe.Crepe(capacity="tiny")

    t = np.arange(16000) / 16000.0
    sweep = np.sin(2 * np.pi * (220 * t + 110 * t**2))
    audio = (0.5 * sweep + 0.02 * rng.standard_normal(16000)).astype(np.float32)

    f0, conf = crepe.predict(
        model, params, audio, batch_size=64, frame_bucket=32
    )
    f0_ref, conf_ref = _oracle_predict(sd, audio)
    np.testing.assert_allclose(f0, f0_ref, rtol=1e-3)
    np.testing.assert_allclose(conf, conf_ref, rtol=1e-3, atol=1e-5)


def test_npz_cache_roundtrip(rng, tmp_path):
    """save_params_npz/load_params_npz preserve the converted pytree
    exactly, and load_torchcrepe_weights dispatches on the .npz
    extension (the cache written by scripts/convert_crepe.py)."""
    sd = _make_torch_tiny_state(rng)
    params = crepe.convert_torchcrepe_state_dict(sd)
    path = str(tmp_path / "tiny.jax.npz")
    crepe.save_params_npz(params, path)
    loaded = crepe.load_torchcrepe_weights(path)

    assert len(loaded["layers"]) == len(params["layers"])
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_crepe_cli(rng, tmp_path):
    """scripts/convert_crepe.py converts a .pth to a loadable .npz cache
    (--skip-check: random weights can't pass the A4 pitch gate)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sd = _make_torch_tiny_state(rng)
    pth = str(tmp_path / "tiny.pth")
    torch.save(sd, pth)
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "scripts", "convert_crepe.py"),
            "--weights", pth, "--capacity", "tiny", "--skip-check",
        ],
        capture_output=True, text=True, timeout=600, cwd=repo,
        env=dict(os.environ, NWS_TPU_PLATFORM="cpu"),
    )
    assert r.returncode == 0, r.stderr
    assert "CREPE_WEIGHTS=" in r.stdout
    cached = str(tmp_path / "tiny.jax.npz")
    assert os.path.exists(cached)
    loaded = crepe.load_torchcrepe_weights(cached)
    assert len(loaded["layers"]) == 6


# ---------------------------------------------------------------------------
# pretrained-weights integration (activates when a torchcrepe .pth exists)
# ---------------------------------------------------------------------------
_WEIGHTS = os.environ.get("CREPE_WEIGHTS", "")


@pytest.mark.skipif(
    not (_WEIGHTS and os.path.exists(_WEIGHTS)),
    reason="set CREPE_WEIGHTS to a torchcrepe full.pth "
    "(github.com/maxrmorrison/torchcrepe, torchcrepe/assets/full.pth)",
)
def test_pretrained_full_tracks_pitch():
    """With real weights the full model must actually track pitch: a
    clean A4 sine decodes within 10 cents with high periodicity."""
    params = jax.tree_util.tree_map(
        jnp.asarray, crepe.load_torchcrepe_weights(_WEIGHTS)
    )
    model = crepe.Crepe(capacity="full")
    t = np.arange(16000) / 16000.0
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    f0, conf = crepe.predict(model, params, audio)
    interior = slice(5, -5)
    cents_err = 1200 * np.abs(np.log2(f0[interior] / 440.0))
    assert np.median(cents_err) < 10.0
    assert conf[interior].mean() > 0.7
