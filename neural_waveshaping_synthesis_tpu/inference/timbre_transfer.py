"""Timbre transfer: arbitrary audio -> control signals -> NEWT synthesis.

Functional equivalent of the reference colab
(``colab/NEWT_Timbre_Transfer.ipynb`` cells 14/15/17/18):

  1. extract F0 (CREPE, max 1000 Hz — or YIN) + perceptual loudness;
  2. adjust controls: confidence gating, octave shift, loudness
     floor/scale, optional box-filter smoothing;
  3. z-score with the target instrument's dataset stats;
  4. synthesize (optionally with the FastNEWT table).

Quirk parity with the colab (cell 15): the model receives the SHIFTED,
SMOOTHED f0 in plain Hz (not normalized), while the control stack gets
the normalized versions; loudness is smoothed after normalization, f0
before. The floor subtracts: x*(x>floor) - floor (going negative where
gated — exactly the colab's arithmetic).
"""
from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from ..data.preprocess.f0_extraction import (
    extract_f0_with_crepe,
    extract_f0_with_yin,
)
from ..data.preprocess.loudness_extraction import extract_perceptual_loudness
from ..data.preprocess.preprocess_audio import (
    convert_to_float32_audio,
    make_monophonic,
    resample_audio,
)


def extract_features(
    audio: np.ndarray,
    sample_rate: float,
    target_sr: float = 16000,
    f0_extractor: str = "yin",
    crepe_weights: Optional[str] = None,
    maximum_frequency: float = 1000.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (audio_16k, f0, confidence, loudness) at the 125 Hz frame rate."""
    audio = make_monophonic(convert_to_float32_audio(np.asarray(audio)))
    if sample_rate != target_sr:
        audio = resample_audio(audio, sample_rate, target_sr)
    if f0_extractor == "crepe":
        f0, confidence = extract_f0_with_crepe(
            audio, maximum_frequency=maximum_frequency, weights_path=crepe_weights
        )
    else:
        f0, confidence = extract_f0_with_yin(
            audio, maximum_frequency=maximum_frequency
        )
    loudness = extract_perceptual_loudness(audio, n_fft=1024, hop_length=128)
    return audio, f0, confidence, loudness


@dataclass(frozen=True)
class ControlAdjustments:
    """The colab's cell-15 sliders."""

    octave_shift: int = 0
    loudness_scale: float = 1.0
    loudness_floor: float = 0.0
    loudness_conf_filter: float = 0.0
    pitch_conf_filter: float = 0.0
    pitch_smoothing: int = 0
    loudness_smoothing: int = 0


def _box_smooth(x: np.ndarray, half_width: int) -> np.ndarray:
    """Zero-padded moving average of width 2*half_width+1 (the colab's
    conv1d with a ones kernel)."""
    if half_width == 0:
        return x
    w = 2 * half_width + 1
    kernel = np.ones(w) / w
    return np.convolve(np.pad(x, (half_width, half_width)), kernel, mode="valid")


def adjust_controls(
    f0: np.ndarray,
    confidence: np.ndarray,
    loudness: np.ndarray,
    data_mean: np.ndarray,
    data_std: np.ndarray,
    adjustments: ControlAdjustments = ControlAdjustments(),
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (f0_hz (Tc,), control (Tc, 2)) ready for the model."""
    a = adjustments
    f0_filtered = f0 * (confidence > a.pitch_conf_filter)
    loud_filtered = loudness * (confidence > a.loudness_conf_filter)
    f0_shifted = f0_filtered * (2.0**a.octave_shift)
    loud_floored = loud_filtered * (loud_filtered > a.loudness_floor) - a.loudness_floor
    loud_scaled = loud_floored * a.loudness_scale

    loud_norm = (loud_scaled - data_mean[1, 0]) / data_std[1, 0]

    f0_hz = _box_smooth(f0_shifted, a.pitch_smoothing)
    loud_norm = _box_smooth(loud_norm, a.loudness_smoothing)
    f0_norm = (f0_hz - data_mean[0, 0]) / data_std[0, 0]

    control = np.stack([f0_norm, loud_norm], axis=-1).astype(np.float32)
    return f0_hz.astype(np.float32), control


def timbre_transfer(
    model,
    params: Dict,
    audio: np.ndarray,
    sample_rate: float,
    data_mean: np.ndarray,
    data_std: np.ndarray,
    adjustments: ControlAdjustments = ControlAdjustments(),
    f0_extractor: str = "yin",
    crepe_weights: Optional[str] = None,
    use_fast_newt: bool = False,
    seed: int = 0,
    frame_bucket: int = 256,
    mesh=None,
) -> Tuple[np.ndarray, float]:
    """Full pipeline -> (synthesized audio (T,), x_realtime factor).

    The returned speed factor is audio_seconds / synthesis_wall_seconds
    for the single jitted forward (the colab cell-18 report), measured
    after compilation. Control length is zero-padded up to a multiple of
    ``frame_bucket`` frames so arbitrary input lengths reuse a handful
    of compiled programs (trimmed after synthesis).

    ``mesh``: a ``jax.sharding.Mesh`` enables time-axis-sharded
    rendering (parallel/time_shard.py) — the audio-rate work splits
    across the mesh's data axis as time chunks, the right parallelism
    for ONE long clip. Mutually exclusive with ``use_fast_newt`` (the
    sharded renderer evaluates the shaper bank directly, which is also
    the faster path on TPU).
    """
    import time

    import jax
    import jax.numpy as jnp

    _, f0, confidence, loudness = extract_features(
        audio, sample_rate, model.sample_rate, f0_extractor, crepe_weights
    )
    f0_hz, control = adjust_controls(
        f0, confidence, loudness, data_mean, data_std, adjustments
    )

    tc = f0_hz.shape[0]
    pad = (-tc) % frame_bucket
    if pad:
        f0_pad = np.pad(f0_hz, (0, pad))
        ctrl_pad = np.pad(control, ((0, pad), (0, 0)))
    else:
        f0_pad, ctrl_pad = f0_hz, control

    if mesh is not None:
        if use_fast_newt:
            raise ValueError("use_fast_newt is not supported with mesh "
                             "(time-sharded) rendering")
        from ..parallel import make_time_sharded_renderer

        fwd = make_time_sharded_renderer(model, mesh)
    else:
        table = (
            model.newt.bake_lookup_table(params["newt"]) if use_fast_newt else None
        )
        fwd = jax.jit(
            lambda p, f, c, k: model.apply(p, f, c, key=k, lookup_table=table)
        )
    f0_in = jnp.asarray(f0_pad[None])
    ctrl_in = jnp.asarray(ctrl_pad[None])
    key = jax.random.PRNGKey(seed)
    np.asarray(fwd(params, f0_in, ctrl_in, key))  # compile + warm

    # the timed window includes the host FETCH: block_until_ready alone
    # returns before device execution completes on tunneled TPU runtimes
    # (CLAUDE.md rule 1), which would inflate the reported speed
    t0 = time.perf_counter()
    out = np.asarray(fwd(params, f0_in, ctrl_in, key))
    wall = time.perf_counter() - t0

    audio_seconds = tc * model.control_hop / model.sample_rate
    return out[0, : tc * model.control_hop], audio_seconds / wall


def stream_timbre_transfer(
    model,
    params: Dict,
    audio: np.ndarray,
    sample_rate: float,
    data_mean: np.ndarray,
    data_std: np.ndarray,
    adjustments: ControlAdjustments = ControlAdjustments(),
    f0_extractor: str = "yin",
    crepe_weights: Optional[str] = None,
    seed: int = 0,
    buffer_size: int = 1024,
    pipeline_depth: int = 4,
) -> Tuple[np.ndarray, Dict]:
    """Timbre transfer synthesized buffer-by-buffer through the
    pipelined streaming driver — the live-serving path, demonstrated on
    file input (the reference has no streaming surface at all; its
    buffer-timing script runs stateless forwards,
    scripts/time_buffer_sizes.py:49-75).

    Control extraction is offline (identical to :func:`timbre_transfer`);
    synthesis then runs one ``buffer_size``-sample buffer at a time with
    fully carried state (streaming/synth.py) and ``pipeline_depth``
    buffers in flight (streaming/pipeline.py), exactly as a live client
    would consume it. Output differs from the offline render only by the
    documented streaming semantics (per-stream phases, segment ramps,
    true-linear reverb).

    Returns ``(audio (T,), stats)`` where stats holds per-buffer cadence
    percentiles (spacing of buffer arrivals on the host), first-buffer
    latency, and the end-to-end x_realtime factor — all measured AFTER a
    warm-up pass so compile time isn't charged to the stream.
    """
    import time

    import jax
    import jax.numpy as jnp

    from ..streaming import PipelinedStreamer, StreamingSynth

    hop = model.control_hop
    if buffer_size % hop:
        raise ValueError(f"buffer_size must be a multiple of control_hop "
                         f"({hop}), got {buffer_size}")
    frames = buffer_size // hop

    _, f0, confidence, loudness = extract_features(
        audio, sample_rate, model.sample_rate, f0_extractor, crepe_weights
    )
    f0_hz, control = adjust_controls(
        f0, confidence, loudness, data_mean, data_std, adjustments
    )

    tc = f0_hz.shape[0]
    n_buffers = -(-tc // frames)
    pad = n_buffers * frames - tc
    f0_b = np.pad(f0_hz, (0, pad)).reshape(n_buffers, 1, frames)
    ctrl_b = np.pad(control, ((0, pad), (0, 0))).reshape(n_buffers, 1, frames, 2)

    synth = StreamingSynth(model, frames)
    # one jitted step shared by warm-up and the measured run: a fresh
    # jax.jit per PipelinedStreamer would re-trace on the measured run's
    # first push and charge ~0.5 s of tracing to first-buffer latency
    jit_step = jax.jit(synth.step)

    def run(collect):
        streamer = PipelinedStreamer(
            synth, params, batch=1, key=jax.random.PRNGKey(seed),
            depth=pipeline_depth, jit_step=jit_step,
        )
        # prime the carried f0 so buffer 0 isn't a 0 Hz -> f0 ramp
        streamer.state = streamer.state._replace(
            prev_f0=jnp.asarray(f0_b[0, :, 0])
        )
        chunks, pops = [], []
        t_start = time.perf_counter()
        first_latency = None
        for i in range(n_buffers):
            out = streamer.push(jnp.asarray(f0_b[i]), jnp.asarray(ctrl_b[i]))
            if out is not None:
                if first_latency is None:
                    first_latency = time.perf_counter() - t_start
                pops.append(time.perf_counter())
                if collect:
                    chunks.append(out)
        for out in streamer.flush():
            if first_latency is None:
                first_latency = time.perf_counter() - t_start
            pops.append(time.perf_counter())
            if collect:
                chunks.append(out)
        wall = time.perf_counter() - t_start
        return chunks, np.asarray(pops), first_latency, wall

    run(collect=False)  # warm-up: compile + cache the step
    chunks, pops, first_latency, wall = run(collect=True)

    out = np.concatenate([c[0] for c in chunks])[: tc * hop]
    audio_seconds = tc * hop / model.sample_rate
    cadence_ms = np.diff(pops) * 1000 if len(pops) > 1 else np.zeros(1)
    stats = {
        "buffer_size": buffer_size,
        "n_buffers": n_buffers,
        "pipeline_depth": pipeline_depth,
        "cadence_p50_ms": float(np.percentile(cadence_ms, 50)),
        "cadence_p95_ms": float(np.percentile(cadence_ms, 95)),
        "first_buffer_latency_ms": float((first_latency or 0.0) * 1000),
        "x_realtime": audio_seconds / wall,
        "buffer_budget_ms": buffer_size / model.sample_rate * 1000,
    }
    return out, stats
