"""Time-axis-sharded rendering must equal the unsharded offline graph.

SURVEY.md §5's "long-context" row: the audio-time axis is the long
dimension; `parallel/time_shard.py` shards the audio-rate work across
the mesh as contiguous time chunks. These tests pin EXACT semantic
equality with `model.apply` (same key => same audio) on the virtual
8-device mesh, across mesh sizes, and on non-divisible frame counts
(the edge-padding path).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping
from neural_waveshaping_synthesis_tpu.parallel import (
    create_mesh,
    make_time_sharded_renderer,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = NeuralWaveshaping()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    return model, params


def _inputs(rng, b, tc):
    f0 = jnp.asarray(
        (220.0 * 2 ** rng.uniform(0, 1, (b, tc))).astype(np.float32)
    )
    control = jnp.asarray(rng.standard_normal((b, tc, 2)).astype(np.float32))
    return f0, control


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_matches_unsharded_render(model_and_params, rng, n_devices):
    model, params = model_and_params
    f0, control = _inputs(rng, 2, 40)
    key = jax.random.PRNGKey(7)

    reference = np.asarray(jax.jit(model.apply)(params, f0, control, key=key))
    mesh = create_mesh(n_devices=n_devices)
    render = make_time_sharded_renderer(model, mesh)
    sharded = np.asarray(render(params, f0, control, key=key))

    assert sharded.shape == reference.shape == (2, 40 * 128)
    # f32 tolerance: sharded vs unsharded programs reassociate the
    # 101-way mixer dot differently; the shaper's input_scale (~30x)
    # amplifies that ~1e-7 to ~1e-4 through sin. Semantic EXACTNESS is
    # proven in float64 below, where reassociation noise vanishes.
    np.testing.assert_allclose(sharded, reference, atol=5e-4, rtol=5e-4)


def test_matches_unsharded_render_exact_f64(model_and_params, rng):
    """In float64 the sharded render must match the unsharded graph to
    1e-7 — proving the chunk decomposition is semantically exact and
    the f32 tolerance above is pure reassociation noise.

    Why not tighter: the two compiled programs use different f64 cumsum
    reduction trees for the phase integral (CLAUDE.md rule 10), and
    that eps-level phase difference is amplified by harmonic index
    (x101) and the shaper's ~30x input_scale inside sin — measured
    7.4e-9 max abs (13x headroom). The historical 1e-10 bound was an
    artifact: dense dots then quantized their f64 outputs to f32
    (preferred_element_type pinned to f32 pre-modules._acc_dtype),
    which rounded BOTH programs to identical f32 values (diff exactly
    0.0) while destroying the precision the bound claimed to measure."""
    model, params = model_and_params
    with jax.enable_x64(True):
        params64 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), params
        )
        f0 = jnp.asarray(
            (220.0 * 2 ** rng.uniform(0, 1, (1, 24))), jnp.float64
        )
        control = jnp.asarray(rng.standard_normal((1, 24, 2)), jnp.float64)
        key = jax.random.PRNGKey(5)
        reference = np.asarray(
            jax.jit(model.apply)(params64, f0, control, key=key)
        )
        render = make_time_sharded_renderer(model, create_mesh())
        sharded = np.asarray(render(params64, f0, control, key=key))
        np.testing.assert_allclose(sharded, reference, atol=1e-7, rtol=1e-7)


def test_non_divisible_frames_pad_path(model_and_params, rng):
    """37 frames over 8 shards: the edge-padded chunks must not perturb
    the true samples — including the last half-hop, whose tail clamp
    must come from the TRUE last frame, not a pad frame."""
    model, params = model_and_params
    f0, control = _inputs(rng, 1, 37)
    key = jax.random.PRNGKey(11)

    reference = np.asarray(jax.jit(model.apply)(params, f0, control, key=key))
    render = make_time_sharded_renderer(model, create_mesh())
    sharded = np.asarray(render(params, f0, control, key=key))

    assert sharded.shape == reference.shape == (1, 37 * 128)
    np.testing.assert_allclose(sharded, reference, atol=5e-4, rtol=5e-4)


def test_same_key_determinism(model_and_params, rng):
    model, params = model_and_params
    f0, control = _inputs(rng, 1, 16)
    render = make_time_sharded_renderer(model, create_mesh())
    a = np.asarray(render(params, f0, control, key=jax.random.PRNGKey(3)))
    b = np.asarray(render(params, f0, control, key=jax.random.PRNGKey(3)))
    c = np.asarray(render(params, f0, control, key=jax.random.PRNGKey(4)))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-6  # different key, different noise/phase


def test_timbre_transfer_mesh_path(model_and_params, rng, tmp_path):
    """The inference surface reaches the sharded renderer: timbre
    transfer with mesh= must produce the same audio as the single-
    program path (same key, f32 reassociation tolerance)."""
    from neural_waveshaping_synthesis_tpu.inference import timbre_transfer

    model, params = model_and_params
    sr = 16000
    t = np.arange(2 * sr) / sr
    audio = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    mean = np.zeros((19, 1), np.float32)
    mean[0] = 300.0
    std = np.ones((19, 1), np.float32)
    std[0] = 60.0

    out_single, _ = timbre_transfer(
        model, params, audio, sr, mean, std, seed=3
    )
    out_sharded, speed = timbre_transfer(
        model, params, audio, sr, mean, std, seed=3, mesh=create_mesh()
    )
    assert out_sharded.shape == out_single.shape
    assert speed > 0
    # 32 s-scale clips: the two programs' phase-cumsum reduction trees
    # differ at the f32 level, and that difference GROWS with clip
    # length (eps(cumsum) ~ f0*T/sr), showing up as a slowly drifting
    # phase wobble (~0.02 rad here) multiplied by the harmonic index.
    # Semantic identity is proven in f64 (test above); at f32 the right
    # check for long clips is energy/spectrum, not samples.
    err = np.sqrt(np.mean((out_sharded - out_single) ** 2))
    ref_rms = np.sqrt(np.mean(out_single**2))
    assert err / ref_rms < 0.02, err / ref_rms
    spec_a = np.abs(np.fft.rfft(out_sharded))
    spec_b = np.abs(np.fft.rfft(out_single))
    spec_err = np.linalg.norm(spec_a - spec_b) / np.linalg.norm(spec_b)
    assert spec_err < 0.02, spec_err

    with pytest.raises(ValueError):
        timbre_transfer(
            model, params, audio, sr, mean, std,
            mesh=create_mesh(), use_fast_newt=True,
        )


def test_bf16_model_matches_unsharded(model_and_params, rng):
    """compute_dtype='bfloat16' models must keep the sharded == unsharded
    contract: the renderer mirrors model.apply's mixed-precision scope."""
    _, params = model_and_params
    model16 = NeuralWaveshaping(compute_dtype="bfloat16")
    f0, control = _inputs(rng, 1, 16)
    key = jax.random.PRNGKey(9)
    reference = np.asarray(jax.jit(model16.apply)(params, f0, control, key=key))
    render = make_time_sharded_renderer(model16, create_mesh())
    sharded = np.asarray(render(params, f0, control, key=key))
    # the renderer computes FiLM through the same bf16 MLP/embedding
    # cast as model.apply (time_shard.py render), so only bf16
    # rounding-order noise remains (measured max abs 9.8e-4 on this
    # fixture; 4x headroom)
    np.testing.assert_allclose(sharded, reference, atol=4e-3, rtol=4e-3)
    # and the bf16 render tracks the f32 one (sanity on the cast scope)
    model32 = NeuralWaveshaping()
    ref32 = np.asarray(jax.jit(model32.apply)(params, f0, control, key=key))
    nrms = np.sqrt(np.mean((sharded - ref32) ** 2)) / (
        np.sqrt(np.mean(ref32**2)) + 1e-12
    )
    assert nrms < 0.05, nrms
