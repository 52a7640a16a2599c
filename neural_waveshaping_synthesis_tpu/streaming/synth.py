"""Stateful buffer-by-buffer NEWT synthesis.

Carried state (one pytree, jit-friendly):
  * ``gru_h``      — control-encoder GRU hidden (B, H)
  * ``osc_phase``  — oscillator phase accumulator (B,), wrapped mod tau
  * ``prev_ctrl``  — last control frame's f0 + FiLM/noise features, so
                     control-rate -> audio-rate interpolation is
                     continuous across buffer boundaries
  * ``noise_tail`` — last n_fft-hop noise samples + OLA tail of the
                     rectangular iSTFT (the noise branch's overlap)
  * ``reverb_fdl`` — frequency-domain delay line for uniform-partitioned
                     convolution with the 2 s learned IR (+ input tail)

Design notes (TPU):
  * one jitted ``step`` per buffer size; static shapes throughout;
  * the reverb is a TRUE linear convolution via partitioned FFT (the
    offline graph's circular wrap is a checkpoint-parity quirk, not
    something a live stream should reproduce);
  * interpolation semantics: within a buffer, parameters ramp linearly
    from the previous control frame to each new frame (segment-wise),
    which equals the offline align_corners=False interpolation up to a
    half-frame phase shift — continuous across buffers by construction;
  * per-stream harmonic phase offsets are drawn once at ``init_state``
    and carried, so a stream is one coherent note, not per-buffer
    re-randomized (the reference re-rolls phases every forward).
"""
from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.modules import dense_apply, gru_apply
from ..models.neural_waveshaping import NeuralWaveshaping
from ..ops.windows import hann_window


class StreamState(NamedTuple):
    gru_h: jnp.ndarray  # (B, H)
    osc_phase: jnp.ndarray  # (B,)
    phase_offset: jnp.ndarray  # (B, n_harmonics)
    prev_f0: jnp.ndarray  # (B,) carried f0 frame (Hz)
    prev_film: jnp.ndarray  # (B, 4C) carried FiLM params
    # NOTE: the noise filter H is deliberately NOT carried/interpolated
    # across buffers: the offline FIRNoiseSynth applies each control
    # frame's filter piecewise to its own STFT frame (no cross-frame
    # interpolation), and the hop-overlapped OLA already crossfades
    # adjacent filtered frames — carrying H would add semantics the
    # offline model doesn't have.
    noise_prev: jnp.ndarray  # (B, n_fft - hop) carried raw noise samples
    noise_ola: jnp.ndarray  # (B, n_fft - hop) iSTFT overlap tail
    # complex spectra ring stored as an (..., 2) float pair: complex64
    # at a jit boundary makes outputs unfetchable on tunneled TPU
    # runtimes (axon); complex lives only INSIDE the compiled step
    reverb_fdl: jnp.ndarray  # (B, P, fft_bins, 2) float re/im ring
    reverb_tail: jnp.ndarray  # (B, block) overlap-add tail
    key: jax.Array


def _segment_interp(prev: jnp.ndarray, frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Ramp from the previous frame value to each new frame over hop
    samples. prev (B, C), frames (B, K, C) -> (B, K*hop, C)."""
    b, k, c = frames.shape
    starts = jnp.concatenate([prev[:, None, :], frames[:, :-1, :]], axis=1)
    t = (jnp.arange(hop, dtype=frames.dtype) + 1.0) / hop  # (hop,)
    seg = starts[:, :, None, :] + (frames - starts)[:, :, None, :] * t[None, None, :, None]
    return seg.reshape(b, k * hop, c)


@dataclass(frozen=True)
class StreamingSynth:
    """Wraps a NeuralWaveshaping config with a streaming step function."""

    model: NeuralWaveshaping
    buffer_frames: int  # control frames per step (buffer = frames * hop)

    @property
    def hop(self) -> int:
        return self.model.control_hop

    @property
    def buffer_size(self) -> int:
        return self.buffer_frames * self.hop

    # -- state ---------------------------------------------------------------
    def init_state(self, params: Dict, batch: int, key: jax.Array) -> StreamState:
        m = self.model
        n_fft = m.noise_synth.ir_length
        hop = self.hop
        block = self.buffer_size
        ir = m.reverb.impulse_response(params["reverb"])
        n_part = -(-ir.shape[0] // block)
        fft_bins = block + 1  # rfft bins of a 2*block FFT

        k_phase, k_state = jax.random.split(key)
        phase_offset = (
            jax.random.uniform(k_phase, (batch, m.osc.n_harmonics)) * 2 * jnp.pi
            - jnp.pi
        )
        return StreamState(
            gru_h=jnp.zeros((batch, m.embedding.hidden_size)),
            osc_phase=jnp.zeros((batch,)),
            phase_offset=phase_offset,
            prev_f0=jnp.zeros((batch,)),
            prev_film=jnp.zeros((batch, 4 * m.n_waveshapers)),
            noise_prev=jnp.zeros((batch, n_fft - hop)),
            noise_ola=jnp.zeros((batch, n_fft - hop)),
            reverb_fdl=jnp.zeros((batch, n_part, fft_bins, 2), jnp.float32),
            reverb_tail=jnp.zeros((batch, block)),
            key=k_state,
        )

    def ir_partition_spectra(self, params: Dict) -> jnp.ndarray:
        """(P, fft_bins, 2) float re/im of zero-padded IR partition rffts
        (precompute once; float pair at the boundary — see StreamState)."""
        from ..ops.fir import partition_ir_spectra

        spec = partition_ir_spectra(
            self.model.reverb.impulse_response(params["reverb"]), self.buffer_size
        )
        return jnp.stack([spec.real, spec.imag], axis=-1)

    # -- step ----------------------------------------------------------------
    def step(
        self,
        params: Dict,
        state: StreamState,
        f0: jnp.ndarray,  # (B, K) Hz control frames
        control: jnp.ndarray,  # (B, K, >=2) normalized control
        ir_spectra: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, StreamState]:
        """Synthesize one buffer: (B, K*hop) audio + next state."""
        m = self.model
        hop = self.hop
        k = self.buffer_frames
        b = f0.shape[0]
        n_fft = m.noise_synth.ir_length

        key, k_noise = jax.random.split(state.key)

        # 1. control encoder with carried GRU state
        emb_seq, gru_h = m.embedding.apply(
            params["embedding"], control[..., :2], state.gru_h
        )  # (B, K, E)

        # 2. control-rate features
        film = m.newt.film_params(params["newt"], emb_seq)  # (B, K, 4C)
        h_re = m.noise_mlp.apply(params["h_generator"], emb_seq)  # (B, K, bins)

        # 3. audio-rate interpolation, continuous across buffers
        f0_aud = _segment_interp(state.prev_f0[:, None], f0[..., None], hop)[..., 0]

        # 4. exciter with carried phase
        bank = m.osc.apply(
            f0_aud, phase_offset=state.phase_offset, initial_phase=state.osc_phase
        )
        osc_phase = m.osc.carry_phase(f0_aud, state.osc_phase)
        exciter = dense_apply(params["harmonic_mixer"], bank)  # (B, T, C)

        # 5. NEWT shaping with the segment-ramped FiLM params. On the
        # TPU backend (and when NEWT.fused opts into a Pallas kernel)
        # the ramp happens IN-KERNEL (kernels/newt_fused.py
        # film_shaper_fused_stream) — the (B, K*hop, 4C) audio-rate
        # film (268 MB f32 at 256 streams x 1024 samples) never
        # exists; geometry gated by supports_stream, chain fallback.
        from ..kernels import newt_fused

        sp = params["newt"]["shaping_fn"]
        if (
            m.newt.fused
            and jax.default_backend() == "tpu"
            and newt_fused.supports_stream(
                m.newt.shaping_fn, k * hop, k
            )
        ):
            x = newt_fused.film_shaper_fused_stream(
                exciter, state.prev_film, film,
                newt_fused.pack_weights_fl(sp), hop,
            )
        else:
            c = m.n_waveshapers
            film_aud = _segment_interp(state.prev_film, film, hop)
            gi, bi, gn, bn = (
                film_aud[..., :c],
                film_aud[..., c : 2 * c],
                film_aud[..., 2 * c : 3 * c],
                film_aud[..., 3 * c :],
            )
            x = gi * exciter + bi
            x = m.newt.shaping_fn.apply(sp, x)
            x = gn * x + bn
        shaped = dense_apply(params["newt"]["mixer"], x)[..., 0]  # (B, T)

        # 6. noise branch: windowed-FIR per frame + streaming rect-OLA
        from ..ops.fir import windowed_fir_from_magnitude

        from ..ops.stft import frame_signal

        h_z = windowed_fir_from_magnitude(h_re)  # (B, K, bins)
        new_noise = jax.random.uniform(k_noise, (b, k * hop))
        noise_sig = jnp.concatenate([state.noise_prev, new_noise], axis=-1)
        # noise_sig length = n_fft + (K-1)*hop -> exactly K frames
        frames = frame_signal(noise_sig, n_fft, hop)  # (B, K, n_fft)
        spec = jnp.fft.rfft(frames, axis=-1) * h_z
        frames_out = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # (B, K, n_fft)

        # rectangular OLA, vectorized: split each frame into r = n_fft/hop
        # hop-sized parts; part i of frame j lands on output block j+i.
        assert n_fft % hop == 0
        r = n_fft // hop
        overlap = n_fft - hop
        parts = frames_out.reshape(b, k, r, hop)
        blocks = jnp.zeros((b, k + r - 1, hop))
        for i in range(r):  # r is tiny (2 for the shipped config)
            blocks = blocks.at[:, i : i + k].add(parts[:, :, i])
        ola = blocks.reshape(b, (k + r - 1) * hop)
        ola = ola.at[:, :overlap].add(state.noise_ola)
        noise_audio = ola[:, : k * hop] / r  # steady-state overlap count
        noise_ola = ola[:, k * hop :]

        dry = shaped + noise_audio

        # 7. reverb: uniform-partitioned FFT convolution (true linear conv)
        from ..ops.fir import partitioned_convolve_step

        if ir_spectra is None:
            ir_spectra = self.ir_partition_spectra(params)
        fdl_c = jax.lax.complex(state.reverb_fdl[..., 0], state.reverb_fdl[..., 1])
        spectra_c = jax.lax.complex(ir_spectra[..., 0], ir_spectra[..., 1])
        wet, fdl_c, reverb_tail = partitioned_convolve_step(
            dry, fdl_c, state.reverb_tail, spectra_c
        )
        fdl = jnp.stack([fdl_c.real, fdl_c.imag], axis=-1)

        audio = dry + wet

        new_state = StreamState(
            gru_h=gru_h,
            osc_phase=osc_phase,
            phase_offset=state.phase_offset,
            prev_f0=f0[:, -1],
            prev_film=film[:, -1],
            # last `overlap` samples == everything past the emitted span
            # (an explicit [-overlap:] breaks when overlap == 0)
            noise_prev=noise_sig[:, k * hop :],
            noise_ola=noise_ola,
            reverb_fdl=fdl,
            reverb_tail=reverb_tail,
            key=key,
        )
        return audio, new_state

    def make_step_fn(self):
        """A jitted step function (params, state, f0, control, ir_spectra).

        The IR spectra must be passed as an argument (NOT closure-
        captured): jit closure constants round-trip through the host, and
        complex64 host transfers are unimplemented on some TPU runtimes
        (axon)."""
        return jax.jit(self.step, donate_argnums=(1,))
