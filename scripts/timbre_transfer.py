"""Timbre transfer CLI — the reference colab's workflow
(colab/NEWT_Timbre_Transfer.ipynb) as a command:

    python scripts/timbre_transfer.py --input voice.wav \
        --checkpoint /path/nws/vn/last.ckpt --output violin_voice.wav \
        --octave-shift 1 --loudness-scale 0.5
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np

from neural_waveshaping_synthesis_tpu import minigin as gin
from neural_waveshaping_synthesis_tpu.utils import write_wav
from scipy.io import wavfile


@click.command()
@click.option("--gin-file", multiple=True, default=("gin/models/newt.gin",))
@click.option("--input", "input_path", required=True)
@click.option("--checkpoint", required=True, help="reference PL .ckpt (stats read from its directory)")
@click.option("--output", "output_path", required=True)
@click.option("--octave-shift", default=0)
@click.option("--loudness-scale", default=1.0)
@click.option("--loudness-floor", default=0.0)
@click.option("--loudness-conf-filter", default=0.0)
@click.option("--pitch-conf-filter", default=0.0)
@click.option("--pitch-smoothing", default=0)
@click.option("--loudness-smoothing", default=0)
@click.option("--f0-extractor", default="yin", type=click.Choice(["yin", "crepe"]))
@click.option("--crepe-weights", default="")
@click.option("--use-fast-newt", is_flag=True)
@click.option("--seed", default=0)
@click.option("--time-shard-devices", default=0,
              help="Shard the audio-time axis over N devices for long "
                   "renders (0 = single-program; see parallel/time_shard.py)")
@click.option("--streaming", is_flag=True,
              help="Synthesize buffer-by-buffer through the pipelined "
                   "streaming driver with carried state (the live-"
                   "serving path) instead of one offline render")
@click.option("--buffer-size", default=1024,
              help="Streaming buffer in samples (multiple of the 128-"
                   "sample control hop)")
@click.option("--pipeline-depth", default=4,
              help="In-flight buffers for --streaming (latency/cadence "
                   "trade; see streaming/pipeline.py)")
def main(gin_file, input_path, checkpoint, output_path, octave_shift,
         loudness_scale, loudness_floor, loudness_conf_filter,
         pitch_conf_filter, pitch_smoothing, loudness_smoothing,
         f0_extractor, crepe_weights, use_fast_newt, seed,
         time_shard_devices, streaming, buffer_size, pipeline_depth):
    import jax
    import jax.numpy as jnp

    from neural_waveshaping_synthesis_tpu.convert import load_reference_checkpoint
    from neural_waveshaping_synthesis_tpu.inference import (
        ControlAdjustments,
        stream_timbre_transfer,
        timbre_transfer,
    )
    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping

    for f in gin_file:
        gin.parse_config_file(f)
    gin.validate_config()
    model = NeuralWaveshaping()
    params, _, data_mean, data_std = load_reference_checkpoint(checkpoint)
    if data_mean is None:
        raise click.ClickException(
            "data_mean.npy/data_std.npy not found next to the checkpoint"
        )
    params = jax.tree_util.tree_map(jnp.asarray, params)

    mesh = None
    if time_shard_devices > 0:
        from neural_waveshaping_synthesis_tpu.parallel import create_mesh

        mesh = create_mesh(n_devices=time_shard_devices)

    sr, audio = wavfile.read(input_path)
    adjustments = ControlAdjustments(
        octave_shift=octave_shift,
        loudness_scale=loudness_scale,
        loudness_floor=loudness_floor,
        loudness_conf_filter=loudness_conf_filter,
        pitch_conf_filter=pitch_conf_filter,
        pitch_smoothing=pitch_smoothing,
        loudness_smoothing=loudness_smoothing,
    )
    if streaming:
        if use_fast_newt or mesh is not None:
            raise click.ClickException(
                "--streaming is mutually exclusive with --use-fast-newt "
                "and --time-shard-devices"
            )
        out, stats = stream_timbre_transfer(
            model, params, audio, sr, data_mean, data_std, adjustments,
            f0_extractor=f0_extractor,
            crepe_weights=crepe_weights or None,
            seed=seed,
            buffer_size=buffer_size,
            pipeline_depth=pipeline_depth,
        )
        write_wav(output_path, out, model.sample_rate)
        audio_secs = len(out) / model.sample_rate
        print(
            f"Streamed {audio_secs:.2f}s to {output_path} in "
            f"{stats['n_buffers']} x {stats['buffer_size']}-sample buffers "
            f"(depth {stats['pipeline_depth']}): cadence p50 "
            f"{stats['cadence_p50_ms']:.2f} ms / p95 "
            f"{stats['cadence_p95_ms']:.2f} ms vs {stats['buffer_budget_ms']:.1f} ms "
            f"budget, first-buffer latency {stats['first_buffer_latency_ms']:.1f} ms, "
            f"{stats['x_realtime']:.0f}x real time end-to-end"
        )
        return

    out, speed = timbre_transfer(
        model,
        params,
        audio,
        sr,
        data_mean,
        data_std,
        adjustments,
        f0_extractor=f0_extractor,
        crepe_weights=crepe_weights or None,
        use_fast_newt=use_fast_newt,
        seed=seed,
        mesh=mesh,
    )

    write_wav(output_path, out, model.sample_rate)
    audio_secs = len(out) / model.sample_rate
    print(f"Synthesized {audio_secs:.2f}s to {output_path} "
          f"({speed:.0f}x faster than real time)")


if __name__ == "__main__":
    main()
