"""A/B harness for the multi-resolution STFT loss formulation.

The round-5 step decomposition (docs/DESIGN.md §3.6) put the loss at
~4.9 ms fwd+bwd of the 31 ms canonical step — the largest non-NEWT
component — while its matmul FLOPs at the shipped HIGHEST precision
bound it from below at ~1 ms. This script measures where the rest
goes: the polyphase variant (einsum accumulation vs block conv), the
MXU precision tier (HIGHEST = 6-pass bf16, HIGH = 3-pass, DEFAULT =
1-pass), and per-resolution cost — and for every precision tier it
also reports the numerical error against an f64 framed-FFT oracle, so
a faster tier can only ship with its accuracy cost stated.

Run on the chip: python scripts/profile_loss.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np


@click.command()
@click.option("--batch-size", default=8)
@click.option("--n-samples", default=64000)
@click.option("--n-short", default=20)
@click.option("--n-long", default=120)
@click.option("--repeats", default=3)
def main(batch_size, n_samples, n_short, n_long, repeats):
    import jax
    import jax.numpy as jnp

    from neural_waveshaping_synthesis_tpu.training.loss import (
        DEFAULT_FFT_SIZES,
        DEFAULT_HOP_SIZES,
        DEFAULT_WIN_LENGTHS,
        multi_resolution_stft_loss,
        stft_loss,
    )
    from neural_waveshaping_synthesis_tpu.utils.profiling import (
        differential_scan_ms,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch_size, n_samples)) * 0.1,
                    jnp.float32)
    y = jnp.asarray(rng.standard_normal((batch_size, n_samples)) * 0.1,
                    jnp.float32)
    print(f"[profile_loss] device={jax.devices()[0]} B={batch_size} "
          f"T={n_samples} scan {n_short}/{n_long} best-of-{repeats}")

    def dep(a, c):
        return a + (c * 1e-30).astype(a.dtype)

    def fwd_bwd(f, *args):
        out, vjp = jax.vjp(f, *args)
        grads = vjp(jnp.float32(1.0))
        return out + sum(
            jnp.sum(g) for g in jax.tree_util.tree_leaves(grads)
        ) * 1e-30

    results = {}

    def timed(name, body):
        ms = differential_scan_ms(body, n_short, n_long, repeats)
        results[name] = ms
        print(f"  {name:<40} {ms:8.3f} ms")

    for variant in ("einsum", "conv"):
        for prec_name in ("HIGHEST", "HIGH", "DEFAULT"):
            prec = getattr(jax.lax.Precision, prec_name)

            def loss_fn(xx):
                return multi_resolution_stft_loss(
                    xx, y, spectrogram_variant=variant, precision=prec
                )

            timed(f"loss_fwd[{variant},{prec_name}]",
                  lambda c, f=loss_fn: f(dep(x, c)) * 1e-30)
            timed(f"loss_fwd_bwd[{variant},{prec_name}]",
                  lambda c, f=loss_fn: fwd_bwd(f, dep(x, c)) * 1e-30)

    # per-resolution split at the shipped settings
    for n_fft, hop, win in zip(
        DEFAULT_FFT_SIZES, DEFAULT_HOP_SIZES, DEFAULT_WIN_LENGTHS
    ):
        def one(xx, n_fft=n_fft, hop=hop, win=win):
            return stft_loss(xx, y, n_fft, hop, win)

        timed(f"res{n_fft}/{hop}_fwd_bwd",
              lambda c, f=one: fwd_bwd(f, dep(x, c)) * 1e-30)

    # accuracy of each precision tier vs the f64 framed-FFT oracle
    # (f64 inputs route to the framed-FFT path; computed on CPU — the
    # TPU has no f64)
    try:
        from jax.experimental import enable_x64

        cpu = jax.devices("cpu")[0]
        with enable_x64():
            x64 = jax.device_put(np.asarray(x, np.float64), cpu)
            y64 = jax.device_put(np.asarray(y, np.float64), cpu)
            ref = float(multi_resolution_stft_loss(x64, y64))
    except Exception as e:  # x64 unavailable: HIGHEST-f32 as yardstick
        print(f"  (f64 oracle unavailable: {e})")
        ref = float(multi_resolution_stft_loss(x, y))
    print(f"  oracle loss value {ref:.9f}")
    for prec_name in ("HIGHEST", "HIGH", "DEFAULT"):
        prec = getattr(jax.lax.Precision, prec_name)
        val = float(multi_resolution_stft_loss(x, y, precision=prec))
        print(f"  value[{prec_name}] {val:.9f}  rel_err {abs(val-ref)/abs(ref):.3e}")


if __name__ == "__main__":
    main()
