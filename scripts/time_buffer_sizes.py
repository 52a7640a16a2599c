"""Latency sweep over buffer sizes (reference scripts/time_buffer_sizes.py:
buffers [256..32768] samples, control frames = buffer//128, 10 warm-ups,
100 timed iterations, CSV rows [model, device, buffer_size, seconds]).

Two modes:
  * default — stateless forwards per buffer (reference behavior: no
    state carry, SURVEY.md §2a #24);
  * --streaming — the real streaming path with carried GRU/phase/
    OLA/reverb state (capability upgrade; measures the true per-buffer
    serving latency including the partitioned-convolution reverb).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np
import pandas as pd

BUFFER_SIZES = [256, 512, 1024, 2048, 4096, 8192, 16384, 32768]


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


@click.command()
@click.option("--gin-file", multiple=True, default=("gin/models/newt.gin",))
@click.option("--gin-binding", "-b", multiple=True,
              help="Extra gin bindings applied after the files")
@click.option("--checkpoint", default="")
@click.option("--iterations", default=100)
@click.option("--warmup", default=10)
@click.option("--use-fast-newt", is_flag=True)
@click.option("--streaming", is_flag=True)
@click.option("--pipeline-depth", default="4,16",
              help="Comma list of in-flight-buffer depths for the "
                   "pipelined-cadence measurement (--streaming only; "
                   "'0' disables it)")
@click.option("--output-csv", default="buffer_times.csv")
@click.option("--buffers", default=",".join(map(str, BUFFER_SIZES)))
def main(gin_file, gin_binding, checkpoint, iterations, warmup, use_fast_newt, streaming,
         pipeline_depth, output_csv, buffers):
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

    if streaming and use_fast_newt:
        raise click.ClickException(
            "--use-fast-newt is not supported with --streaming (the "
            "streaming step always evaluates the shaper bank directly, "
            "which is also the faster path on TPU)"
        )

    device = str(jax.devices()[0])
    mode = "streaming" if streaming else "stateless"
    model_name = f"newt_tpu_{mode}" + ("_fast" if use_fast_newt else "")
    table = model.newt.bake_lookup_table(params["newt"]) if use_fast_newt else None

    rows = []
    summary_rows = []
    rng = np.random.default_rng(0)
    for buffer_size in [int(b) for b in buffers.split(",")]:
        frames = buffer_size // model.control_hop
        if frames < 1:
            continue
        f0 = jnp.asarray((220.0 + 220.0 * rng.random((1, frames))).astype(np.float32))
        control = jnp.asarray(rng.standard_normal((1, frames, 2)).astype(np.float32))

        # Every timed iteration FETCHES the synthesized buffer to the
        # host — a streaming client needs the samples, and on tunneled
        # TPU runtimes block_until_ready returns before execution
        # finishes, so only the fetch is an honest latency.
        if streaming:
            from neural_waveshaping_synthesis_tpu.streaming import StreamingSynth

            synth = StreamingSynth(model, frames)
            ir_spectra = synth.ir_partition_spectra(params)
            step = jax.jit(synth.step)
            state = synth.init_state(params, 1, jax.random.PRNGKey(0))
            # one untimed call always runs (compile), regardless of --warmup
            audio, state = step(params, state, f0, control, ir_spectra)
            for _ in range(warmup):
                audio, state = step(params, state, f0, control, ir_spectra)
            np.asarray(audio)
            times = []
            for _ in range(iterations):
                t0 = time.perf_counter()
                audio, state = step(params, state, f0, control, ir_spectra)
                np.asarray(audio)
                times.append(time.perf_counter() - t0)

            # device-only step time, DIFFERENTIAL: time a 100-step and a
            # 600-step compiled scan and divide the difference by 500.
            # Each scan fetch includes one host round-trip, but the RTT
            # is additive and identical in expectation, so differencing
            # cancels it — a single-scan measurement is RTT-noise-bound
            # (~±10 ms on this tunnel ⇒ ±0.05 ms/step even at n=200,
            # and the former RTT/n_scan bias inflated 0.10 ms to 0.72).
            def make_scan(n):
                @jax.jit
                def scan_steps(p, s0, f, c, spec):
                    def body(s, _):
                        a, s2 = synth.step(p, s, f, c, spec)
                        return s2, a[0, 0]
                    s_final, outs = jax.lax.scan(body, s0, None, length=n)
                    return outs.sum()
                return scan_steps

            s_small, s_big = make_scan(100), make_scan(600)
            float(s_small(params, state, f0, control, ir_spectra))  # compile
            float(s_big(params, state, f0, control, ir_spectra))
            diffs = []
            for _ in range(3):
                t_s = _timed(lambda: float(
                    s_small(params, state, f0, control, ir_spectra)))
                t_b = _timed(lambda: float(
                    s_big(params, state, f0, control, ir_spectra)))
                diffs.append((t_b - t_s) / 500 * 1000)
            dev_ms = float(np.median(diffs))
            print(f"               device-only step: {dev_ms:7.3f} ms "
                  f"(differential 600-100 scan, 3 reps)")

            # pipelined cadence: dispatch buffer k+depth before fetching
            # buffer k (streaming/pipeline.py), overlapping the flat
            # tunnel RTT across in-flight buffers. Cadence = spacing of
            # consecutive buffer arrivals on the host; the cost is
            # `depth` buffers of output latency, reported via the
            # first-buffer-latency column.
            pipe_rows = []
            for depth in [int(d) for d in str(pipeline_depth).split(",") if int(d) > 0]:
                from neural_waveshaping_synthesis_tpu.streaming import (
                    PipelinedStreamer,
                )

                streamer = PipelinedStreamer(
                    synth, params, 1, jax.random.PRNGKey(0),
                    depth=depth, jit_step=step,
                )
                t0 = time.perf_counter()
                for _ in range(depth + 1):
                    streamer.push(f0, control)  # last one returns buffer 0
                first_lat_ms = (time.perf_counter() - t0) * 1000
                for _ in range(warmup):
                    streamer.push(f0, control)
                pops = []
                for _ in range(max(iterations, 200)):
                    streamer.push(f0, control)
                    pops.append(time.perf_counter())
                cad = np.diff(np.asarray(pops)) * 1000
                pipe_rows.append(
                    (depth, np.percentile(cad, 50), np.percentile(cad, 95),
                     first_lat_ms)
                )
                print(f"               pipelined cadence (depth {depth}): "
                      f"p50 {pipe_rows[-1][1]:7.3f} ms  "
                      f"p95 {pipe_rows[-1][2]:7.3f} ms  "
                      f"first-buffer latency {first_lat_ms:7.3f} ms")
        else:
            fwd = jax.jit(
                lambda p, f, c, k: model.apply(p, f, c, key=k, lookup_table=table)
            )
            out = fwd(params, f0, control, jax.random.PRNGKey(0))  # compile
            for i in range(warmup):
                out = fwd(params, f0, control, jax.random.PRNGKey(i))
            np.asarray(out)
            times = []
            for i in range(iterations):
                t0 = time.perf_counter()
                np.asarray(fwd(params, f0, control, jax.random.PRNGKey(i)))
                times.append(time.perf_counter() - t0)

        times = np.asarray(times)
        budget = buffer_size / model.sample_rate
        p50, p95 = np.percentile(times, 50) * 1000, np.percentile(times, 95) * 1000
        print(
            f"buffer {buffer_size:6d}: p50 {p50:7.3f} ms  "
            f"p95 {p95:7.3f} ms  "
            f"budget {budget*1000:7.3f} ms  "
            f"{'OK' if p50 < budget * 1000 else 'OVER'}"
        )
        rows += [
            {"model": model_name, "device": device, "buffer_size": buffer_size,
             "seconds": t}
            for t in times
        ]
        if streaming:
            # latency decomposition: the scan-measured device step is the
            # on-chip cost; everything above it in the per-call totals is
            # host round-trip (dispatch + fetch through the tunnel).
            # One row per pipeline depth (serial columns repeat).
            for depth, pipe_p50, pipe_p95, first_lat_ms in (
                pipe_rows or [(0, float("nan"), float("nan"), float("nan"))]
            ):
                summary_rows.append(
                    {
                        "model": model_name, "device": device,
                        "buffer_size": buffer_size,
                        "p50_ms": p50, "p95_ms": p95,
                        "device_step_ms": dev_ms,
                        "host_rtt_p50_ms": max(p50 - dev_ms, 0.0),
                        "host_rtt_p95_ms": max(p95 - dev_ms, 0.0),
                        "pipeline_depth": depth,
                        "pipelined_cadence_p50_ms": pipe_p50,
                        "pipelined_cadence_p95_ms": pipe_p95,
                        "first_buffer_latency_ms": first_lat_ms,
                        "budget_ms": budget * 1000,
                    }
                )

    pd.DataFrame(rows).to_csv(output_csv, index=False)
    print(f"wrote {output_csv}")
    if summary_rows:
        base, ext = os.path.splitext(output_csv)
        summary_csv = f"{base}_summary{ext or '.csv'}"
        pd.DataFrame(summary_rows).to_csv(summary_csv, index=False)
        print(f"wrote {summary_csv} (p50/p95 with device/host-RTT split)")


if __name__ == "__main__":
    main()
