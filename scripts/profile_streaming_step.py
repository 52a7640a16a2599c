"""Component-level breakdown of the streaming synthesis step.

Where the per-buffer milliseconds live — the serving-capacity analogue
of ``profile_train_step.py``, at a configurable number of concurrent
streams (the batch axis) and buffer size. Timing method and its two
traps (loop-invariant hoisting, DCE): see
``utils/profiling.differential_scan_ms``.

The full-step row threads the REAL ``StreamState`` through the scan
(state evolves every iteration — phase advances, the PRNG key splits,
the reverb delay line shifts — so nothing is hoistable), making it
directly comparable to ``time_buffer_sizes.py --streaming``'s
device-step column and ``serving_capacity.py``'s step cost. Component
rows isolate each stage of ``StreamingSynth.step`` with
carry-perturbed inputs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np

from neural_waveshaping_synthesis_tpu import minigin as gin


@click.command()
@click.option("--gin-file", multiple=True, default=("gin/models/newt.gin",))
@click.option("--batch-streams", default=64, help="Concurrent streams (batch)")
@click.option("--buffer-size", default=1024, help="Samples per buffer")
@click.option("--n-short", default=20, help="Short scan length")
@click.option("--n-long", default=120, help="Long scan length")
@click.option("--repeats", default=3, help="Timed dispatches per length (best kept)")
@click.option("--probe", multiple=True,
              help="Run only these probes (repeatable); default all")
def main(gin_file, batch_streams, buffer_size, n_short, n_long, repeats, probe):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in gin_file:
        gin.parse_config_file(os.path.join(repo, f) if not os.path.isabs(f) else f)

    import jax
    import jax.numpy as jnp

    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping
    from neural_waveshaping_synthesis_tpu.models.modules import dense_apply
    from neural_waveshaping_synthesis_tpu.ops.fir import (
        partitioned_convolve_step,
        windowed_fir_from_magnitude,
    )
    from neural_waveshaping_synthesis_tpu.streaming import StreamingSynth
    from neural_waveshaping_synthesis_tpu.utils.profiling import (
        differential_scan_ms,
    )

    gin.validate_config()
    model = NeuralWaveshaping()
    hop = int(model.control_hop)
    if buffer_size % hop:
        raise click.UsageError(f"buffer size must be a multiple of {hop}")
    k = buffer_size // hop
    synth = StreamingSynth(model, k)
    dev = jax.devices()[0]
    print(f"[profile_streaming_step] device={dev.platform} "
          f"streams={batch_streams} buffer={buffer_size} (K={k} frames) "
          f"scan {n_short}/{n_long} x best-of-{repeats}")

    b = batch_streams
    params = model.init(jax.random.PRNGKey(0))
    state0 = synth.init_state(params, b, jax.random.PRNGKey(1))
    ir_spectra = synth.ir_partition_spectra(params)

    rng = np.random.default_rng(0)
    f0 = jnp.asarray(220.0 * 2.0 ** rng.uniform(0, 2, (b, k)), jnp.float32)
    control = jnp.asarray(rng.standard_normal((b, k, 2)), jnp.float32)
    ta = k * hop
    c_ws = model.n_waveshapers
    f0_aud = jnp.repeat(f0, hop, axis=1)
    exciter = jnp.asarray(rng.standard_normal((b, ta, c_ws)) * 0.3, jnp.float32)
    film_aud = jnp.asarray(rng.standard_normal((b, ta, 4 * c_ws)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((b, k, 128)), jnp.float32)
    h_mag = jnp.abs(jnp.asarray(
        rng.standard_normal((b, k, model.noise_synth.ir_length // 2 + 1)),
        jnp.float32,
    ))
    dry = jnp.asarray(rng.standard_normal((b, ta)) * 0.1, jnp.float32)

    def _dep(x, c):
        return x + (c * 1e-30).astype(x.dtype)

    # ---- full step: real state threaded through the scan ------------------
    def p_full_step(carry):
        state = carry
        audio, new_state = synth.step(params, state, f0, control, ir_spectra)
        return new_state

    def p_control_gru(c):
        emb_seq, _ = model.embedding.apply(
            params["embedding"], _dep(control, c)[..., :2], state0.gru_h
        )
        return jnp.sum(emb_seq) * 1e-30

    def p_film_and_noise_mlp(c):
        e = _dep(emb, c)
        film = model.newt.film_params(params["newt"], e)
        h = model.noise_mlp.apply(params["h_generator"], e)
        return (jnp.sum(film) + jnp.sum(h)) * 1e-30

    def p_oscillator(c):
        bank = model.osc.apply(
            _dep(f0_aud, c),
            phase_offset=state0.phase_offset,
            initial_phase=state0.osc_phase,
        )
        return jnp.sum(dense_apply(params["harmonic_mixer"], bank)) * 1e-30

    def p_shaper(c):
        x = _dep(exciter, c)
        gi, bi = film_aud[..., :c_ws], film_aud[..., c_ws : 2 * c_ws]
        gn, bn = film_aud[..., 2 * c_ws : 3 * c_ws], film_aud[..., 3 * c_ws :]
        x = gi * x + bi
        x = model.newt.shaping_fn.apply(params["newt"]["shaping_fn"], x)
        x = gn * x + bn
        return jnp.sum(dense_apply(params["newt"]["mixer"], x)) * 1e-30

    def p_noise_fft(c):
        h_z = windowed_fir_from_magnitude(_dep(h_mag, c))
        return (jnp.sum(h_z.real) + jnp.sum(h_z.imag)) * 1e-30

    def p_reverb_fdl(c):
        fdl_c = jax.lax.complex(
            state0.reverb_fdl[..., 0], state0.reverb_fdl[..., 1]
        )
        spectra_c = jax.lax.complex(ir_spectra[..., 0], ir_spectra[..., 1])
        wet, fdl_c, tail = partitioned_convolve_step(
            _dep(dry, c), fdl_c, state0.reverb_tail, spectra_c
        )
        return (jnp.sum(wet) + jnp.sum(fdl_c.real) + jnp.sum(tail)) * 1e-30

    probes = {
        "full_step": (p_full_step, state0),
        "control_gru": (p_control_gru, None),
        "film_and_noise_mlp": (p_film_and_noise_mlp, None),
        "oscillator_mixer": (p_oscillator, None),
        "shaper": (p_shaper, None),
        "noise_filter_fir": (p_noise_fft, None),
        "reverb_fdl": (p_reverb_fdl, None),
    }
    selected = list(probe) if probe else list(probes)
    unknown = [s for s in selected if s not in probes]
    if unknown:
        raise click.UsageError(
            f"unknown probes {unknown}; available: {list(probes)}"
        )

    width = max(len(s) for s in selected)
    results = {}
    for name in selected:
        body, init = probes[name]
        ms = differential_scan_ms(body, n_short, n_long, repeats,
                                  init_carry=init)
        results[name] = ms
        print(f"  {name:<{width}}  {ms:8.3f} ms")
    total = results.get("full_step")
    if total and total > 0:
        budget = 1000.0 * buffer_size / float(model.sample_rate)
        headroom = budget / total
        print(f"[profile_streaming_step] full step {total:.3f} ms for "
              f"{batch_streams} streams — {headroom:.1f}x inside the "
              f"{budget:.1f} ms buffer budget "
              f"(device-side capacity ~{batch_streams * headroom:.0f} "
              f"streams at this batch's per-stream cost)")


if __name__ == "__main__":
    main()
