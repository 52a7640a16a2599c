"""Benchmark the full forward pass (reference scripts/time_forward_pass.py:
100 timed forwards of a 4 s dummy input, reporting scipy describe stats,
mean RTF and 90th-percentile RTF where RTF = wall_seconds/audio_seconds
— lower is better).

Deviations from the reference (all flagged):
  * a warm-up pass excludes jit compilation (the reference times cold
    torch dispatch in iteration 0);
  * each timed iteration FETCHES the audio to the host — on tunneled
    TPU runtimes block_until_ready returns before execution finishes,
    so only a data fetch gives an honest end-to-end latency;
  * a separate device-only throughput figure runs N forwards inside one
    compiled scan (no per-call host round-trips).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np
import scipy.stats


@click.command()
@click.option("--gin-file", multiple=True, default=("gin/models/newt.gin",))
@click.option("--gin-binding", "-b", multiple=True,
              help="Extra gin bindings applied after the files")
@click.option("--checkpoint", default="", help="optional PL .ckpt or orbax dir")
@click.option("--batch-size", default=1)
@click.option("--length-in-seconds", default=4.0)
@click.option("--iterations", default=100)
@click.option("--use-fast-newt", is_flag=True)
@click.option("--async-pipeline", is_flag=True,
              help="queue all iterations, sync once (throughput mode)")
@click.option("--profile-dir", default="",
              help="write a jax.profiler trace of the timed loop here")
def main(gin_file, gin_binding, checkpoint, batch_size, length_in_seconds, iterations,
         use_fast_newt, async_pipeline, profile_dir):
    import jax
    import jax.numpy as jnp

    from neural_waveshaping_synthesis_tpu import minigin as gin
    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping

    for f in gin_file:
        gin.parse_config_file(f)
    for b in gin_binding:
        gin.parse_config(b)
    gin.validate_config()
    model = NeuralWaveshaping()

    if checkpoint:
        from neural_waveshaping_synthesis_tpu.convert import (
            load_reference_checkpoint,
        )

        params, _, _, _ = load_reference_checkpoint(checkpoint)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        params = model.init(jax.random.PRNGKey(0))

    tc = int(length_in_seconds * model.sample_rate / model.control_hop)
    rng = np.random.default_rng(0)
    f0 = jnp.asarray(
        (200.0 + 200.0 * rng.random((batch_size, tc))).astype(np.float32)
    )
    control = jnp.asarray(rng.standard_normal((batch_size, tc, 2)).astype(np.float32))

    table = model.newt.bake_lookup_table(params["newt"]) if use_fast_newt else None
    fwd = jax.jit(lambda p, f, c, k: model.apply(p, f, c, key=k, lookup_table=table))

    np.asarray(fwd(params, f0, control, jax.random.PRNGKey(0)))  # compile

    keys = [jax.random.PRNGKey(i) for i in range(iterations)]
    audio_seconds = tc * model.control_hop / model.sample_rate

    # device-only throughput: N forwards inside one compiled scan
    base_key = jax.random.PRNGKey(0)

    @jax.jit
    def scan_run(p, f, c):
        def body(acc, i):
            out = model.apply(
                p, f, c, key=jax.random.fold_in(base_key, i),
                lookup_table=table,
            )
            return acc + out[0, 0], None
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(iterations))[0]

    float(scan_run(params, f0, control))
    t0 = time.perf_counter()
    float(scan_run(params, f0, control))
    dev = (time.perf_counter() - t0) / iterations
    print(
        f"Device-only: {dev*1000:.3f} ms/forward, RTF {dev/audio_seconds:.6f} "
        f"({audio_seconds/dev:.0f}x realtime)"
    )

    if async_pipeline:
        t0 = time.perf_counter()
        out = None
        for k in keys:
            out = fwd(params, f0, control, k)
        np.asarray(out)  # fetch forces completion of the whole queue
        total = time.perf_counter() - t0
        per = total / iterations
        print(f"Throughput mode: {per*1000:.3f} ms/forward, "
              f"RTF {per/audio_seconds:.6f} ({audio_seconds/per:.0f}x realtime)")
        return

    from neural_waveshaping_synthesis_tpu.utils import trace

    times = []
    with trace(profile_dir or None):
        for k in keys:
            t0 = time.perf_counter()
            np.asarray(fwd(params, f0, control, k))  # host receives audio
            times.append(time.perf_counter() - t0)
    times = np.asarray(times)

    print(scipy.stats.describe(times))
    rtf = times / audio_seconds
    print(f"Mean host-round-trip RTF: {rtf.mean():.6f} "
          f"({1.0/rtf.mean():.0f}x realtime)")
    print(f"90th percentile RTF: {np.percentile(rtf, 90):.6f}")


if __name__ == "__main__":
    main()
