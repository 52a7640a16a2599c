"""Canonical training-step benchmark.

One number to rule them all: the per-step device time of the full
training step (forward + multi-res STFT loss + backward + Adam update)
at a given batch size, measured the only honest way on this platform —
N steps inside ONE compiled ``lax.scan`` (the trainer's real fast path,
``training/trainer.py make_multi_train_step``), timed around the fetch
of the (N,) loss array. ``block_until_ready`` returns early on the
tunneled runtime, and a per-step python loop measures dispatch latency,
not compute (docs/DESIGN.md §2).

Example:
    python scripts/time_train_step.py --batch-size 8 --scan-steps 50
    python scripts/time_train_step.py --bf16   # mixed-precision variant
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np

from neural_waveshaping_synthesis_tpu import minigin as gin


@click.command()
@click.option("--gin-file", multiple=True, default=("gin/train/train_newt.gin",))
@click.option("--batch-size", default=8, help="Clips per step (reference recipe: 8)")
@click.option("--n-frames", default=500, help="Control frames per clip (500 = 4 s)")
@click.option("--scan-steps", default=50, help="Steps fused into one dispatch")
@click.option("--repeats", default=3, help="Timed scan dispatches (after warm-up)")
@click.option("--bf16", is_flag=True, help="bfloat16 compute in the synthesis graph")
@click.option("--remat", is_flag=True, help="rematerialize the shaper bank in backward")
@click.option("--trace-dir", default="", help="Write a jax.profiler trace of one timed dispatch")
@click.option("--gin-binding", multiple=True,
              help="Extra gin bindings for A/Bs, e.g. \"NEWT.fused = 'full_lane'\"")
def main(gin_file, batch_size, n_frames, scan_steps, repeats, bf16, remat,
         trace_dir, gin_binding):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in gin_file:
        gin.parse_config_file(os.path.join(repo, f) if not os.path.isabs(f) else f)
    if bf16:
        gin.parse_config("NeuralWaveshaping.compute_dtype = 'bfloat16'")
    if remat:
        gin.parse_config("NEWT.remat_shaper = True")
    for b in gin_binding:
        gin.parse_config(b)

    import jax
    import jax.numpy as jnp

    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping
    from neural_waveshaping_synthesis_tpu.training import TrainConfig, init_train_state
    from neural_waveshaping_synthesis_tpu.training.trainer import make_multi_train_step

    # validate AFTER the imports above: they register the configurables
    # the gin files bind (validating earlier flags everything as unknown)
    gin.validate_config()

    model = NeuralWaveshaping()
    cfg = TrainConfig()
    dev = jax.devices()[0]
    print(f"[time_train_step] device={dev.platform} batch={batch_size} "
          f"frames={n_frames} scan={scan_steps} bf16={bf16}")

    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    multi_step = jax.jit(make_multi_train_step(model, cfg), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    t_audio = n_frames * int(model.control_hop)
    batches = {
        "audio": jnp.asarray(
            rng.standard_normal((scan_steps, batch_size, t_audio)) * 0.1,
            jnp.float32,
        ),
        "f0": jnp.asarray(
            220.0 * 2.0 ** rng.uniform(0, 2, (scan_steps, batch_size, n_frames)),
            jnp.float32,
        ),
        "control": jnp.asarray(
            rng.standard_normal((scan_steps, batch_size, n_frames, 2)),
            jnp.float32,
        ),
    }
    key = jax.random.PRNGKey(1)

    # warm-up: compile + one full execution, result fetched
    t0 = time.time()
    state, losses = multi_step(state, batches, key)
    first = np.asarray(losses)
    print(f"[time_train_step] compile+first run {time.time() - t0:.1f}s, "
          f"loss[0]={first[0]:.4f} loss[-1]={first[-1]:.4f}")
    assert np.all(np.isfinite(first)), "non-finite losses"

    from neural_waveshaping_synthesis_tpu.utils.profiling import trace

    per_step_ms = []
    for i in range(repeats):
        with trace(trace_dir if i == repeats - 1 else None):
            t0 = time.time()
            state, losses = multi_step(state, batches, key)
            np.asarray(losses)  # fetch = the only reliable completion barrier
            per_step_ms.append((time.time() - t0) * 1000.0 / scan_steps)
    best = min(per_step_ms)
    audio_s = batch_size * t_audio / float(model.sample_rate)
    print(f"[time_train_step] per-step ms over {repeats} dispatches: "
          + ", ".join(f"{m:.1f}" for m in per_step_ms))
    print(f"[time_train_step] best {best:.1f} ms/step "
          f"({1000.0 / best:.2f} steps/s, {audio_s / (best / 1000.0):.0f} "
          f"audio-seconds/s)")


if __name__ == "__main__":
    main()
