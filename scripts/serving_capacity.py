"""Serving capacity: how many concurrent real-time streams one chip
sustains through the pipelined streaming driver.

The reference has no serving story at all — its buffer-timing script
(`/root/reference/scripts/time_buffer_sizes.py:49-75`) times stateless
batch-1 forwards. A production synthesis server instead runs B
independent voices as ONE batched streaming step (the batch axis of
`streaming/synth.py` — per-stream GRU/phase/OLA/reverb state), and the
pipelined driver (`streaming/pipeline.py`) overlaps the host round
trips. This script sweeps B and reports, per batch size:

  * steady-state cadence p50/p95 (spacing of buffer-batch arrivals on
    the host — every iteration FETCHES the synthesized samples, the
    only honest latency on a tunneled runtime, CLAUDE.md rule 1);
  * real-time verdict vs the buffer budget (buffer/sr seconds);
  * aggregate synthesized-audio throughput (streams x sr x realtime).

The capacity headline is the largest swept B whose cadence percentile
stays under budget. Inputs are uploaded from host numpy per push
(per-buffer controls arrive from clients in a real deployment); with
``--fetch-int16`` the device casts to int16 before the fetch, halving
the bytes on the link — the wire format of 16-bit wav clients.

The verdict is SELF-CALIBRATING: cadence on a tunneled runtime depends
on the link's state as much as on the chip (RESULTS.md §9 measured 256
streams in one window and 128 in a degraded-link window on identical
code), so the same run measures the no-op dispatch round trip and the
per-MB fetch bandwidth before AND after the sweep, labels the link
(healthy / degraded), emits both as CSV columns, and stamps the
capacity line with the label — a future reader can tell which regime
their number came from without archaeology.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np
import pandas as pd


@click.command()
@click.option("--gin-file", multiple=True, default=("gin/models/newt.gin",))
@click.option("--gin-binding", "-b", multiple=True)
@click.option("--checkpoint", default="")
@click.option("--buffer-size", default=1024,
              help="Samples per stream per buffer (multiple of the "
                   "control hop); budget = buffer/sr seconds")
@click.option("--batches", default="1,2,4,8,16,32,64,128,256,512",
              help="Comma list of concurrent-stream counts to sweep")
@click.option("--pipeline-depth", default=4)
@click.option("--iterations", default=200)
@click.option("--warmup", default=20)
@click.option("--percentile", default=95.0,
              help="Cadence percentile that must stay under budget for "
                   "the real-time verdict")
@click.option("--fetch-int16", is_flag=True,
              help="Cast to int16 on device before fetching (16-bit "
                   "wav wire format; halves link bytes)")
@click.option("--rtt-healthy-ms", default=30.0,
              help="Link no-op RTT p50 above this labels the run "
                   "'degraded' (RESULTS.md §9's two regimes)")
@click.option("--output-csv", default="serving_capacity.csv")
def main(gin_file, gin_binding, checkpoint, buffer_size, batches,
         pipeline_depth, iterations, warmup, percentile, fetch_int16,
         rtt_healthy_ms, output_csv):
    import jax
    import jax.numpy as jnp

    from neural_waveshaping_synthesis_tpu import minigin as gin
    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping
    from neural_waveshaping_synthesis_tpu.streaming import (
        PipelinedStreamer,
        StreamingSynth,
    )

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

    if buffer_size % model.control_hop:
        raise click.ClickException(
            f"buffer-size must be a multiple of control_hop "
            f"({model.control_hop})"
        )
    frames = buffer_size // model.control_hop
    budget_ms = buffer_size / model.sample_rate * 1000
    device = str(jax.devices()[0])
    synth = StreamingSynth(model, frames)

    def jit_step_for(collect_dtype):
        """step wrapper fetching in the requested wire dtype."""
        if collect_dtype == "int16":
            def step(p, s, f, c, spec):
                audio, s2 = synth.step(p, s, f, c, spec)
                wire = jnp.clip(audio * 32767.0, -32768, 32767).astype(
                    jnp.int16)
                return wire, s2
            return jax.jit(step)
        return jax.jit(synth.step)

    step = jit_step_for("int16" if fetch_int16 else "float32")
    wire = "int16" if fetch_int16 else "float32"

    def measure_link(reps=25):
        """(no-op dispatch RTT p50 ms, fetch bandwidth MB/s) right now.

        RTT: dispatch a trivial jitted program and fetch its scalar —
        the flat per-call cost every serial step pays on this runtime.
        Fetch BW: device_get of a 4 MB device-resident array, RTT
        subtracted, per-MB rate.
        """
        noop = jax.jit(lambda v: v + 1.0)
        v = jnp.float32(0.0)
        float(noop(v))  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            v = noop(v)
            float(v)
            ts.append(time.perf_counter() - t0)
        rtt_ms = float(np.percentile(np.asarray(ts) * 1e3, 50))

        # A FRESH array per rep: jax caches an array's host copy, so
        # re-fetching the same buffer is free after the first call.
        mb = 16.0
        bump = jax.jit(lambda b, s: b + s)
        buf = jnp.zeros((int(mb * 1024 * 1024 // 4),), jnp.float32)
        np.asarray(bump(buf, 0.0))  # compile/materialize
        ts = []
        for i in range(max(reps // 3, 5)):
            t0 = time.perf_counter()
            np.asarray(bump(buf, float(i + 1)))
            ts.append(time.perf_counter() - t0)
        per_fetch_ms = float(np.percentile(np.asarray(ts) * 1e3, 50))
        bw = mb / max(per_fetch_ms - rtt_ms, 1e-3) * 1e3
        return rtt_ms, bw

    rtt_pre, fetch_bw_pre = measure_link()
    print(f"link (pre-sweep): no-op RTT p50 {rtt_pre:.1f} ms, "
          f"fetch {fetch_bw_pre:.0f} MB/s")

    rows = []
    rng = np.random.default_rng(0)
    capacity = 0
    for batch in [int(b) for b in batches.split(",")]:
        # fresh per-push host inputs: controls arrive from clients each
        # buffer in a real server, so the upload is part of the loop
        n_distinct = 8
        f0s = [(220.0 + 220.0 * rng.random((batch, frames))).astype(np.float32)
               for _ in range(n_distinct)]
        ctrls = [rng.standard_normal((batch, frames, 2)).astype(np.float32)
                 for _ in range(n_distinct)]

        # compile this batch shape untimed so first-buffer latency
        # reports the pipeline fill, not the (cached-once) XLA compile
        state0 = synth.init_state(params, batch, jax.random.PRNGKey(0))
        spec0 = synth.ir_partition_spectra(params)
        a0, _ = step(params, state0, jnp.asarray(f0s[0]),
                     jnp.asarray(ctrls[0]), spec0)
        np.asarray(a0)

        streamer = PipelinedStreamer(
            synth, params, batch, jax.random.PRNGKey(0),
            depth=pipeline_depth, jit_step=step,
        )
        t0 = time.perf_counter()
        for i in range(pipeline_depth + 1):
            out = streamer.push(f0s[i % n_distinct], ctrls[i % n_distinct])
        first_lat_ms = (time.perf_counter() - t0) * 1000
        assert out is not None and out.dtype == np.dtype(wire), out.dtype
        for i in range(warmup):
            streamer.push(f0s[i % n_distinct], ctrls[i % n_distinct])
        pops = []
        for i in range(iterations):
            streamer.push(f0s[i % n_distinct], ctrls[i % n_distinct])
            pops.append(time.perf_counter())
        cad = np.diff(np.asarray(pops)) * 1000
        p50 = float(np.percentile(cad, 50))
        p95 = float(np.percentile(cad, 95))
        pcap = float(np.percentile(cad, percentile))
        realtime = pcap < budget_ms
        if realtime:
            capacity = max(capacity, batch)
        x_rt = budget_ms / p50
        agg = batch * model.sample_rate * x_rt
        print(
            f"streams {batch:5d}: cadence p50 {p50:8.3f} ms  "
            f"p95 {p95:8.3f} ms  vs budget {budget_ms:.1f} ms  "
            f"{'REAL-TIME' if realtime else 'OVER'}  "
            f"(first-buffer {first_lat_ms:7.1f} ms, "
            f"{agg/1e6:8.2f} Msamples/s aggregate)"
        )
        rows.append({
            "device": device, "wire_dtype": wire,
            "buffer_size": buffer_size, "batch_streams": batch,
            "pipeline_depth": pipeline_depth,
            "cadence_p50_ms": p50, "cadence_p95_ms": p95,
            "first_buffer_latency_ms": first_lat_ms,
            "budget_ms": budget_ms, "realtime": realtime,
            "aggregate_msamples_per_s": agg / 1e6,
        })

    rtt_post, fetch_bw_post = measure_link()
    print(f"link (post-sweep): no-op RTT p50 {rtt_post:.1f} ms, "
          f"fetch {fetch_bw_post:.0f} MB/s")
    # gate on the WORSE of the two windows: a link that degraded
    # mid-sweep taints the whole sweep
    rtt = max(rtt_pre, rtt_post)
    fetch_bw = min(fetch_bw_pre, fetch_bw_post)
    link_state = "healthy" if rtt <= rtt_healthy_ms else "degraded"
    for row in rows:
        row.update(
            link_rtt_ms=rtt, link_fetch_mbps=fetch_bw,
            link_state=link_state,
        )

    pd.DataFrame(rows).to_csv(output_csv, index=False)
    print(f"wrote {output_csv}")
    print(
        f"capacity: {capacity} concurrent real-time streams per chip "
        f"(@{buffer_size}-sample buffers, p{percentile:g} cadence < "
        f"{budget_ms:.1f} ms, wire {wire}) — link {link_state} "
        f"(no-op RTT p50 {rtt:.1f} ms <= {rtt_healthy_ms:g} ms "
        f"threshold{'' if link_state == 'healthy' else ' EXCEEDED'}, "
        f"fetch {fetch_bw:.0f} MB/s)"
    )


if __name__ == "__main__":
    main()
