"""A/B the exciter-fused kernels (xcr / xfull) against the shipped
default on the batch-1 resynthesis headline (bench.py configuration).

Run on the chip: python scripts/ab_fused_exciter.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(model, params, f0, control, iters=100, repeats=3):
    base_key = jax.random.PRNGKey(0)

    @jax.jit
    def run(p, f, c):
        def body(acc, i):
            out = model.apply(p, f, c, key=jax.random.fold_in(base_key, i))
            return acc + out[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    float(run(params, f0, control))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(params, f0, control))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    from neural_waveshaping_synthesis_tpu.convert import (
        load_reference_checkpoint,
    )
    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping

    params, _, _, _ = load_reference_checkpoint(
        "/root/reference/checkpoints/nws/vn/last.ckpt"
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)

    tc = 500
    rng = np.random.default_rng(0)
    f0 = jnp.asarray((220.0 + 220.0 * rng.random((1, tc))).astype(np.float32))
    control = jnp.asarray(rng.standard_normal((1, tc, 2)).astype(np.float32))

    configs = {
        "unfused (r4 default: cr kernel, XLA bank+mixer)": dict(
            fuse_exciter=False, fuse_out_mixer=False
        ),
        "xcr (bank+mixer in-kernel)": dict(
            fuse_exciter=True, fuse_out_mixer=False
        ),
        "xfull (bank+mixer+out-mixer in-kernel)": dict(
            fuse_exciter=True, fuse_out_mixer=True
        ),
    }
    audio_seconds = tc * 128 / 16000.0
    print(f"[ab_fused_exciter] device={jax.devices()[0]} batch=1 tc={tc}")
    for name, kw in configs.items():
        model = NeuralWaveshaping(**kw)
        sec = measure(model, params, f0, control)
        print(f"  {name:<50} {sec*1e3:7.3f} ms/clip  "
              f"{audio_seconds/sec:7.1f}x RT")


if __name__ == "__main__":
    main()
