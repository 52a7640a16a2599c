"""Headline benchmark: real-time factor of 4-s batch-1 resynthesis on
one TPU chip with the converted reference `vn` checkpoint (the
scripts/time_forward_pass.py configuration, SURVEY.md §6 metric #1).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x_realtime", "vs_baseline": R}

``value`` is audio_seconds / wall_seconds (higher is better; 1.0 =
real time). ``vs_baseline`` is value / 100 — the ratio against the
north-star target of >100x real time per chip (BASELINE.json); >1.0
beats the target.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR_X_REALTIME = 100.0
CKPT = "/root/reference/checkpoints/nws/vn/last.ckpt"


def main():
    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping

    model = NeuralWaveshaping()
    if os.path.exists(CKPT):
        from neural_waveshaping_synthesis_tpu.convert import (
            load_reference_checkpoint,
        )

        params, _, _, _ = load_reference_checkpoint(CKPT)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        params = model.init(jax.random.PRNGKey(0))

    tc = 500  # 4 s at the 125 Hz control rate
    audio_seconds = tc * model.control_hop / model.sample_rate

    rng = np.random.default_rng(0)
    f0 = jnp.asarray((220.0 + 220.0 * rng.random((1, tc))).astype(np.float32))
    control = jnp.asarray(rng.standard_normal((1, tc, 2)).astype(np.float32))

    # N forwards inside ONE compiled scan, result reduced and FETCHED:
    # on tunneled TPU runtimes block_until_ready returns before device
    # execution completes, so loop-and-block timing measures dispatch
    # latency, not compute. This measures honest device throughput.
    iters = 100
    base_key = jax.random.PRNGKey(0)

    @jax.jit
    def run(p, f, c):
        def body(acc, i):
            out = model.apply(p, f, c, key=jax.random.fold_in(base_key, i))
            return acc + out[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    float(run(params, f0, control))  # compile + warm
    t0 = time.perf_counter()
    float(run(params, f0, control))  # fetch forces real completion
    wall = (time.perf_counter() - t0) / iters

    x_realtime = audio_seconds / wall
    print(
        json.dumps(
            {
                "metric": "resynthesis_speed_4s_batch1",
                "value": round(x_realtime, 1),
                "unit": "x_realtime",
                "vs_baseline": round(x_realtime / NORTH_STAR_X_REALTIME, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
