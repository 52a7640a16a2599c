"""Time-axis-sharded offline rendering (SURVEY.md §5 "long-context").

For long offline renders (minutes of audio) the batch axis is useless
for scaling — one clip is one row. The long axis is TIME, and NEWT's
audio-rate work is pointwise once (a) the oscillator phase and (b) the
FiLM parameters are known: the shaper bank, FiLM modulation, harmonic
expansion, and mixer matmuls parallelize perfectly across time chunks.

Split of labor (chosen so the sharded render is EXACTLY the offline
graph, not an approximation):

  * replicated (cheap, O(T) with tiny constants): the 125 Hz GRU (a
    sequential scan — cheap at control rate), the FiLM/noise MLPs, the
    f0 upsample, the global phase integral (one cumsum — XLA lowers it
    to a log-depth scan), the noise-branch STFT filtering (F frames of
    256-point FFTs), and the final reverb FFT. Replication is free of
    collectives and keeps bit-identical semantics with the offline
    graph's quirks (centered noise STFT edges, circular reverb wrap).
  * sharded over the mesh 'data' axis as contiguous time chunks (the
    ~95% of FLOPs/bytes): harmonic-bank sines (T x 101), the
    harmonic-mixer matmul, FiLM-parameter upsampling to audio rate
    (T x 256 materialization), the waveshaper bank (T x 64 x 8
    activations), and the NEWT mixer.

Chunk boundaries are exact, not approximated:

  * phase: each chunk slices the GLOBAL phase integral, so there is no
    per-chunk accumulator drift and no prefix machinery;
  * FiLM upsampling: each chunk receives its frames plus one halo frame
    on each side, EDGE-CLAMPED at the global ends; the segment-ramp
    construction below then reproduces `ops/upsample.linear_upsample`'s
    align_corners=False output bit-for-bit on every chunk, including
    the half-hop head clamp and tail (verified by
    tests/test_time_shard.py against the unsharded render).

The same key produces the same audio as ``model.apply`` because the
stochastic draws (phase offsets, uniform noise) happen once, replicated,
with the model's own key-split structure.

Precision note for very long renders: the phase integral is a single
f32 cumsum whose absolute error grows with clip length (eps(f0*T/sr)
cycles) — identically in the sharded and unsharded offline graphs (and
in the reference's torch.cumsum), but the compiled reduction TREES may
differ between programs, so two renders of a minutes-long clip agree
in spectrum/energy rather than sample-for-sample
(tests/test_time_shard.py documents the bound). Streaming synthesis
(streaming/synth.py), which wraps its phase accumulator every buffer,
is the precision-correct choice for unbounded durations.
"""
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..models.modules import dense_apply
from ..ops.oscillator import bank_from_phase, draw_phase_offset, phase_accumulate
from ..ops.upsample import linear_upsample
from .mesh import DATA_AXIS


def _upsample_chunk(halo: jnp.ndarray, hop: int) -> jnp.ndarray:
    """(B, K+2, C) edge-clamped halo frames -> (B, K*hop, C): the chunk's
    slice of the global align_corners=False linear upsample.

    Global output sample s takes segment m = (s - hop/2) // hop ramping
    x[m] -> x[m+1] (with the global head/tail clamps). A chunk covering
    frames [m0, m0+K) spans segments m0-1 .. m0+K-1, i.e. frames
    m0-1 .. m0+K — exactly the K+2 halo rows. Building the K+1 segment
    ramps and slicing off the first hop/2 samples reproduces the global
    formula: at the global head the clamped halo makes segment -1 a
    constant x[0] ramp (== the head clamp), and at the global tail the
    clamped halo makes the last segment a constant x[T-1] ramp (== the
    tail clip)."""
    b, kp2, c = halo.shape
    lo = halo[:, :-1]  # (B, K+1, C) segment starts
    hi = halo[:, 1:]  # segment ends
    w = ((jnp.arange(hop, dtype=halo.dtype) + 0.5) / hop)[None, None, :, None]
    mid = lo[:, :, None, :] * (1.0 - w) + hi[:, :, None, :] * w
    mid = mid.reshape(b, (kp2 - 1) * hop, c)
    half = hop // 2
    return mid[:, half : half + (kp2 - 2) * hop]


def make_time_sharded_renderer(model, mesh):
    """-> jitted fn(params, f0, control, key) rendering (B, Tc*hop) audio
    with audio-rate work sharded over the mesh's data axis as time
    chunks. Semantically identical to ``model.apply`` (same key => same
    audio); use for single long clips where batch parallelism has
    nothing to shard.

    Optional kwargs of the returned fn mirror the injection hooks of
    ``model.apply`` (noise, phase_offset) for deterministic tests.
    """
    hop = int(model.control_hop)
    n_shards = int(mesh.shape[DATA_AXIS])
    n_harmonics = int(model.osc.n_harmonics)
    # the oscillator's OWN rate: phase integration and the antialias
    # mask must match osc.apply even if it is gin-configured differently
    # from the model-level sample_rate
    osc_rate = float(model.osc.sample_rate)
    c = int(model.n_waveshapers)
    shaping_fn = model.newt.shaping_fn
    compute_dtype = jnp.dtype(model.compute_dtype)

    def chunk_fn(shard_params, phase_ck, f0_ck, film_ck, offset):
        # shard_map hands each device its (1, ...) slice of the leading
        # chunk axis
        phase_ck, f0_ck, film_ck = phase_ck[0], f0_ck[0], film_ck[0]
        bank = bank_from_phase(
            phase_ck, f0_ck, n_harmonics, osc_rate, offset
        )
        if compute_dtype != jnp.float32:
            # mirror model.apply's mixed-precision scope exactly: bf16
            # bank/mixer + bf16 NEWT block, f32 accumulators via
            # dense_apply, f32 result after the final mixer
            bank = bank.astype(compute_dtype)
            film_ck = film_ck.astype(compute_dtype)
            shard_params = {
                # model.apply keeps the harmonic-mixer BIAS f32
                # (neural_waveshaping.py render_exciter) — mirror that
                "harmonic_mixer": {
                    "w": shard_params["harmonic_mixer"]["w"].astype(compute_dtype),
                    "b": shard_params["harmonic_mixer"]["b"],
                },
                "shaping_fn": jax.tree_util.tree_map(
                    lambda x: x.astype(compute_dtype), shard_params["shaping_fn"]
                ),
                "mixer": jax.tree_util.tree_map(
                    lambda x: x.astype(compute_dtype), shard_params["mixer"]
                ),
            }
        exciter = dense_apply(shard_params["harmonic_mixer"], bank)
        film_aud = _upsample_chunk(film_ck, hop)  # (B, chunk, 4C)
        gi = film_aud[..., :c]
        bi = film_aud[..., c : 2 * c]
        gn = film_aud[..., 2 * c : 3 * c]
        bn = film_aud[..., 3 * c :]
        x = gi * exciter + bi
        x = shaping_fn.apply(shard_params["shaping_fn"], x)
        x = gn * x + bn
        shaped = dense_apply(shard_params["mixer"], x)[..., 0]  # (B, chunk)
        return shaped[None].astype(jnp.float32)

    sharded_chunks = shard_map(
        chunk_fn,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
    )

    def render(
        params: Dict,
        f0: jnp.ndarray,
        control: jnp.ndarray,
        key: Optional[jax.Array] = None,
        noise: Optional[jnp.ndarray] = None,
        phase_offset: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, tc = f0.shape
        ta = tc * hop
        if key is not None:
            k_phase, k_noise = jax.random.split(key)
        else:
            k_phase = k_noise = None

        # -- replicated control-rate stack (identical to model.apply) ----
        embedding, _ = model.get_embedding(params, control)
        if compute_dtype != jnp.float32:
            # model.apply casts ALL of p["newt"] + the embedding to the
            # compute dtype before newt.apply, so the FiLM MLP runs in
            # bf16 there — mirror that here or bf16 sharded/unsharded
            # renders diverge beyond reassociation noise
            film = model.newt.film_params(
                jax.tree_util.tree_map(
                    lambda x: x.astype(compute_dtype), params["newt"]
                ),
                embedding.astype(compute_dtype),
            )  # (B,Tc,4C) in compute_dtype
        else:
            film = model.newt.film_params(params["newt"], embedding)  # (B,Tc,4C)
        h = model.noise_mlp.apply(params["h_generator"], embedding)
        noise_audio = model.noise_synth.apply(h, key=k_noise, noise=noise)

        f0_up = linear_upsample(f0[..., None], ta)[..., 0]  # (B, Ta)
        phase = phase_accumulate(f0_up, osc_rate)
        if phase_offset is None:
            if k_phase is not None:
                phase_offset = draw_phase_offset(k_phase, n_harmonics, f0.dtype)
            else:
                phase_offset = jnp.zeros((n_harmonics,), f0.dtype)

        # -- chunking (edge-pad so pad frames clamp like the true tail) --
        k_frames = -(-tc // n_shards)  # frames per chunk
        tc_pad = k_frames * n_shards
        pad_f = tc_pad - tc
        film_p = jnp.pad(film, ((0, 0), (0, pad_f), (0, 0)), mode="edge")
        f0_up_p = jnp.pad(f0_up, ((0, 0), (0, pad_f * hop)), mode="edge")
        phase_p = jnp.pad(phase, ((0, 0), (0, pad_f * hop)), mode="edge")

        chunk = k_frames * hop
        phase_c = phase_p.reshape(b, n_shards, chunk).swapaxes(0, 1)
        f0_c = f0_up_p.reshape(b, n_shards, chunk).swapaxes(0, 1)
        # halo frames, edge-clamped at the global ends
        film_pp = jnp.pad(film_p, ((0, 0), (1, 1), (0, 0)), mode="edge")
        film_halo = jnp.stack(
            [
                film_pp[:, i * k_frames : i * k_frames + k_frames + 2]
                for i in range(n_shards)
            ]
        )  # (n, B, K+2, 4C)

        shard_params = {
            "harmonic_mixer": params["harmonic_mixer"],
            "shaping_fn": params["newt"]["shaping_fn"],
            "mixer": params["newt"]["mixer"],
        }
        shaped_c = sharded_chunks(
            shard_params, phase_c, f0_c, film_halo, phase_offset
        )  # (n, B, chunk)
        shaped = shaped_c.swapaxes(0, 1).reshape(b, tc_pad * hop)[:, :ta]

        mixed = shaped + noise_audio
        return model.reverb.apply(params["reverb"], mixed)

    return jax.jit(render)
