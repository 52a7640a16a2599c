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


def test_streaming_matches_matched_oracle_sample_exact(rng):
    """Chunked streaming with carried state == ONE-SHOT full-sequence
    render with the stream's own semantics, in the sample domain.

    The loose spectral test below compares against the OFFLINE graph,
    whose semantics legitimately differ (half-frame interpolation
    shift, per-call phases, circular reverb); a real streaming-state
    bug (mis-carried GRU state, phase accumulator, noise OLA tail,
    reverb delay line) can hide inside its 0.85-overlap gate. This
    oracle injects every documented delta — the stream's phase_offset
    and noise key chain, segment interpolation from the same initial
    carry, a linear reverb — so the only thing left to differ IS the
    chunking, and asserts golden-level nRMS. (Floor: the one-shot
    phase cumsum reduction tree differs from the chunked one by
    f32 eps of the accumulated phase — CLAUDE.md rule 10 — which at
    this clip length is ~1e-4 audio nRMS, inside the 1e-3 gate.)
    """
    from neural_waveshaping_synthesis_tpu.models import (
        ControlModule,
        FIRNoiseSynth,
        HarmonicOscillator,
        NEWT,
        NeuralWaveshaping,
        Reverb,
        TimeDistributedMLP,
    )
    from neural_waveshaping_synthesis_tpu.models.modules import dense_apply
    from neural_waveshaping_synthesis_tpu.ops.fir import (
        windowed_fir_from_magnitude,
    )
    from neural_waveshaping_synthesis_tpu.ops.stft import frame_signal
    from neural_waveshaping_synthesis_tpu.streaming.synth import (
        _segment_interp,
    )

    # A tiny model whose noise branch HAS a cross-buffer overlap
    # (ir_length = 2*hop -> r=2), unlike tiny_model's r=1 — the OLA
    # carry is exactly the kind of state this test exists to pin.
    model = NeuralWaveshaping(
        n_waveshapers=8,
        control_hop=32,
        sample_rate=4000,
        embedding=ControlModule(2, 32, 32),
        osc=HarmonicOscillator(n_harmonics=16, sample_rate=4000),
        newt=NEWT(
            n_waveshapers=8,
            control_embedding_size=32,
            shaping_fn_size=4,
            shaping_fn_depth=3,
        ),
        noise_mlp=TimeDistributedMLP(32, 32, 33, depth=3),
        noise_synth=FIRNoiseSynth(ir_length=64, hop_length=32),
        reverb=Reverb(length_in_seconds=1, sr=4000),
    )
    params = model.init(jax.random.PRNGKey(0))
    synth = StreamingSynth(model, buffer_frames=4)
    hop, k_frames, n_buffers = synth.hop, synth.buffer_frames, 12
    b, tc = 2, 4 * n_buffers
    ta = tc * hop
    c = model.n_waveshapers
    n_fft = model.noise_synth.ir_length
    r = n_fft // hop

    f0 = jnp.asarray(
        110.0 * 2.0 ** rng.uniform(0, 1, (b, tc)), jnp.float32
    )
    control = jnp.asarray(rng.standard_normal((b, tc, 2)), jnp.float32)

    # ---- streamed: n_buffers chunked steps with carried state ----------
    root_key = jax.random.PRNGKey(3)
    state = synth.init_state(params, b, root_key)
    step = jax.jit(synth.step)
    chunks = []
    for i in range(n_buffers):
        sl = slice(i * k_frames, (i + 1) * k_frames)
        audio, state = step(params, state, f0[:, sl], control[:, sl])
        chunks.append(np.asarray(audio))
    streamed = np.concatenate(chunks, axis=-1)

    # ---- matched one-shot oracle ---------------------------------------
    # replicate init_state's key split and the per-step noise chain
    k_phase, k_state = jax.random.split(root_key)
    phase_offset = (
        jax.random.uniform(k_phase, (b, model.osc.n_harmonics)) * 2 * jnp.pi
        - jnp.pi
    )
    key, noises = k_state, []
    for _ in range(n_buffers):
        key, k_noise = jax.random.split(key)
        noises.append(jax.random.uniform(k_noise, (b, k_frames * hop)))
    noise_full = jnp.concatenate(noises, axis=-1)  # (b, ta)

    emb, _ = model.embedding.apply(params["embedding"], control[..., :2])
    film = model.newt.film_params(params["newt"], emb)  # (b, tc, 4C)
    h_re = model.noise_mlp.apply(params["h_generator"], emb)

    f0_aud = _segment_interp(
        jnp.zeros((b, 1)), f0[..., None], hop
    )[..., 0]
    film_aud = _segment_interp(jnp.zeros((b, 4 * c)), film, hop)

    bank = model.osc.apply(f0_aud, phase_offset=phase_offset)
    exciter = dense_apply(params["harmonic_mixer"], bank)
    gi, bi = film_aud[..., :c], film_aud[..., c : 2 * c]
    gn, bn = film_aud[..., 2 * c : 3 * c], film_aud[..., 3 * c :]
    x = gi * exciter + bi
    x = model.newt.shaping_fn.apply(params["newt"]["shaping_fn"], x)
    x = gn * x + bn
    shaped = dense_apply(params["newt"]["mixer"], x)[..., 0]

    # noise branch one-shot: same zero-primed prefix, frame/filter/OLA
    noise_sig = jnp.concatenate(
        [jnp.zeros((b, n_fft - hop)), noise_full], axis=-1
    )
    frames = frame_signal(noise_sig, n_fft, hop)  # (b, tc, n_fft)
    spec = jnp.fft.rfft(frames, axis=-1) * windowed_fir_from_magnitude(h_re)
    frames_out = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    parts = frames_out.reshape(b, tc, r, hop)
    blocks = jnp.zeros((b, tc + r - 1, hop))
    for i in range(r):
        blocks = blocks.at[:, i : i + tc].add(parts[:, :, i])
    noise_audio = blocks.reshape(b, (tc + r - 1) * hop)[:, :ta] / r

    dry = shaped + noise_audio
    ir = model.reverb.impulse_response(params["reverb"])
    wet = fft_convolve_full(dry, ir)[..., :ta]
    oracle = np.asarray(dry + wet)

    assert streamed.shape == oracle.shape == (b, ta)
    err = np.sqrt(np.mean((streamed - oracle) ** 2))
    scale = np.sqrt(np.mean(oracle**2)) + 1e-12
    assert err / scale < 1e-3, f"streaming-vs-oracle nRMS {err / scale}"


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
