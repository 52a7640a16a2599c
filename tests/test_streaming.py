"""Streaming synthesis tests: partitioned convolution exactness, GRU
state chaining, cross-buffer continuity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_waveshaping_synthesis_tpu.models.modules import gru_apply, gru_init
from neural_waveshaping_synthesis_tpu.ops.fir import (
    fft_convolve_full,
    partition_ir_spectra,
    partitioned_convolve_step,
)
from neural_waveshaping_synthesis_tpu.streaming import StreamingSynth

from test_training import tiny_model


def test_partitioned_convolution_matches_linear(rng):
    """Streamed partitioned FFT convolution == direct linear convolution."""
    block, n_blocks = 64, 12
    ir = rng.standard_normal(300).astype(np.float32) * 0.2
    x = rng.standard_normal((2, block * n_blocks)).astype(np.float32)

    spectra = partition_ir_spectra(jnp.asarray(ir), block)
    n_part = spectra.shape[0]
    fdl = jnp.zeros((2, n_part, block + 1), jnp.complex64)
    tail = jnp.zeros((2, block))
    outs = []
    for i in range(n_blocks):
        y, fdl, tail = partitioned_convolve_step(
            jnp.asarray(x[:, i * block : (i + 1) * block]), fdl, tail, spectra
        )
        outs.append(np.asarray(y))
    streamed = np.concatenate(outs, axis=-1)

    direct = np.asarray(fft_convolve_full(jnp.asarray(x), jnp.asarray(ir)))
    np.testing.assert_allclose(streamed, direct[:, : block * n_blocks],
                               rtol=1e-3, atol=1e-4)


def test_gru_state_chaining(rng):
    """GRU over [a; b] == GRU over a, then b with the carried state."""
    p = gru_init(jax.random.PRNGKey(0), 2, 16)
    x = jnp.asarray(rng.standard_normal((3, 20, 2)).astype(np.float32))
    full, h_full = gru_apply(p, x)
    first, h1 = gru_apply(p, x[:, :12])
    second, h2 = gru_apply(p, x[:, 12:], h1)
    np.testing.assert_allclose(np.asarray(full[:, :12]), np.asarray(first),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(full[:, 12:]), np.asarray(second),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_full), np.asarray(h2),
                               rtol=1e-5, atol=1e-6)


@pytest.fixture
def streaming_setup():
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    synth = StreamingSynth(model, buffer_frames=4)  # 4*32 = 128-sample buffers
    return model, params, synth


def test_streaming_shapes_and_state(streaming_setup, rng):
    model, params, synth = streaming_setup
    state = synth.init_state(params, batch=2, key=jax.random.PRNGKey(1))
    f0 = jnp.full((2, 4), 110.0)
    control = jnp.asarray(rng.standard_normal((2, 4, 2)).astype(np.float32))
    audio, state2 = synth.step(params, state, f0, control)
    assert audio.shape == (2, synth.buffer_size)
    assert bool(jnp.isfinite(audio).all())
    # state advanced
    assert not np.allclose(np.asarray(state2.gru_h), np.asarray(state.gru_h))
    assert float(state2.osc_phase[0]) != 0.0


def test_streaming_continuity(streaming_setup, rng):
    """A constant-pitch stream must have no discontinuity spikes at
    buffer boundaries: the max sample-to-sample jump at junctions must
    be comparable to the interior (not an outlier)."""
    model, params, synth = streaming_setup
    state = synth.init_state(params, batch=1, key=jax.random.PRNGKey(1))
    # prime prev_f0 so the first buffer isn't a 0->110 Hz ramp
    state = state._replace(prev_f0=jnp.full((1,), 110.0))
    f0 = jnp.full((1, 4), 110.0)
    control = jnp.zeros((1, 4, 2))
    step = jax.jit(synth.step)
    chunks = []
    for _ in range(8):
        audio, state = step(params, state, f0, control)
        chunks.append(np.asarray(audio[0]))
    x = np.concatenate(chunks)
    dx = np.abs(np.diff(x))
    interior_max = dx.max()
    junctions = [len(c) * i for i, c in enumerate(chunks[1:], 1)]
    junction_jumps = dx[[j - 1 for j in junctions]]
    # junction jumps within 2x the global max step (no resets/clicks)
    assert (junction_jumps <= 2.0 * interior_max + 1e-6).all()


def test_streaming_deterministic_given_key(streaming_setup, rng):
    model, params, synth = streaming_setup
    f0 = jnp.full((1, 4), 110.0)
    control = jnp.asarray(rng.standard_normal((1, 4, 2)).astype(np.float32))
    outs = []
    for _ in range(2):
        state = synth.init_state(params, batch=1, key=jax.random.PRNGKey(7))
        a1, state = synth.step(params, state, f0, control)
        a2, state = synth.step(params, state, f0, control)
        outs.append(np.concatenate([np.asarray(a1), np.asarray(a2)], -1))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_pipelined_matches_serial(streaming_setup, rng):
    """PipelinedStreamer changes WHEN buffers reach the host, never what
    they are: depth-4 pipelined output must be bit-identical to the
    serial step loop over the same control stream."""
    from neural_waveshaping_synthesis_tpu.streaming import PipelinedStreamer

    model, params, synth = streaming_setup
    n_buffers = 10
    f0s = [jnp.full((1, 4), 110.0 + 5.0 * i) for i in range(n_buffers)]
    ctrls = [
        jnp.asarray(rng.standard_normal((1, 4, 2)).astype(np.float32))
        for _ in range(n_buffers)
    ]

    # serial reference
    state = synth.init_state(params, 1, jax.random.PRNGKey(11))
    ir_spectra = synth.ir_partition_spectra(params)
    step = jax.jit(synth.step)
    serial = []
    for f0, c in zip(f0s, ctrls):
        audio, state = step(params, state, f0, c, ir_spectra)
        serial.append(np.asarray(audio))

    streamer = PipelinedStreamer(
        synth, params, batch=1, key=jax.random.PRNGKey(11), depth=4
    )
    piped = []
    for f0, c in zip(f0s, ctrls):
        out = streamer.push(f0, c)
        if out is not None:
            piped.append(out)
    piped.extend(streamer.flush())

    assert len(piped) == n_buffers
    for s, p in zip(serial, piped):
        np.testing.assert_array_equal(s, p)


def test_pipelined_priming_and_flush(streaming_setup, rng):
    """push returns None for exactly `depth` priming calls, then one
    buffer per push; flush drains the remaining `depth` buffers."""
    from neural_waveshaping_synthesis_tpu.streaming import PipelinedStreamer

    model, params, synth = streaming_setup
    depth = 3
    streamer = PipelinedStreamer(
        synth, params, batch=2, key=jax.random.PRNGKey(0), depth=depth
    )
    f0 = jnp.full((2, 4), 110.0)
    control = jnp.zeros((2, 4, 2))
    outs = [streamer.push(f0, control) for _ in range(7)]
    assert all(o is None for o in outs[:depth])
    assert all(o is not None and o.shape == (2, synth.buffer_size)
               for o in outs[depth:])
    drained = list(streamer.flush())
    assert len(drained) == depth
    assert len(streamer) == 0
    with pytest.raises(IndexError):
        streamer.pop()


def test_streaming_approximates_offline_render(streaming_setup, rng):
    """A streamed render should spectrally match the offline graph on
    steady-state content (semantics differ by a half-frame interpolation
    shift, per-stream vs per-call phases, and linear vs circular reverb
    — so the comparison is distributional, not sample-exact)."""
    model, params, synth = streaming_setup
    k_frames = synth.buffer_frames
    n_buffers = 16
    tc = k_frames * n_buffers
    f0_val = 110.0
    f0 = jnp.full((1, tc), f0_val)
    control = jnp.zeros((1, tc, 2))

    offline = np.asarray(
        model.apply(params, f0, control, key=jax.random.PRNGKey(3))
    )[0]

    state = synth.init_state(params, 1, jax.random.PRNGKey(3))
    state = state._replace(prev_f0=jnp.full((1,), f0_val))
    chunks = []
    step = jax.jit(synth.step)
    for i in range(n_buffers):
        sl = slice(i * k_frames, (i + 1) * k_frames)
        audio, state = step(params, state, f0[:, sl], control[:, sl])
        chunks.append(np.asarray(audio[0]))
    streamed = np.concatenate(chunks)

    assert streamed.shape == offline.shape
    # compare magnitude spectra of the steady-state second half
    half = len(streamed) // 2
    so = np.abs(np.fft.rfft(offline[half:] * np.hanning(half)))
    ss = np.abs(np.fft.rfft(streamed[half:] * np.hanning(half)))
    so, ss = so / (so.sum() + 1e-12), ss / (ss.sum() + 1e-12)
    overlap = np.sum(np.sqrt(so * ss))
    assert overlap > 0.85, overlap
    # comparable energy
    assert 0.3 < streamed[half:].std() / (offline[half:].std() + 1e-12) < 3.0
