"""Empirical roofline for the NEWT waveshaper bank (DESIGN.md §3.4).

The shaper bank is ~71% of the canonical training step; DESIGN §3
calls its broadcast-einsum form "the fastest known expression" after
thirteen measured alternatives — but A/Bs only bound it from above.
This script bounds it from BELOW: it measures the chip's actual
elementwise-compute and memory ceilings with microbenchmarks, counts
the bank's arithmetic exactly, and prints the hardware floor next to
the measured times, so "done optimizing" becomes a ratio instead of a
judgment.

Microbenchmarks (all array-carry differential scans — the carry IS the
working array, so loop-invariant hoisting and DCE are impossible by
construction; see utils/profiling.differential_scan_ms):

  hbm_stream      x <- x * a + eps          1 read + 1 write / elem
  fma128 / fma64  x <- x * a + x0, K deep   K fma / elem, full/half lane
  psin128         x <- psin(x) + x0 * eps   K polynomial sines / elem
  xsin128         same with exact jnp.sin   XLA's sin lowering
  pallas_*        the fma / psin chains inside trivial Pallas kernels
                  (same math, same shapes) — Mosaic-vs-XLA codegen gap

Shaper probes (the thing being bounded, at canonical train shape
B=8 x T=64000 x C=64, W=8, depth 4):

  shaper_fwd / shaper_fwd_bwd            einsum formulation (shipped)
  shaper_fused_fwd / shaper_fused_fwd_bwd  Pallas film_shaper_fused

Run on the real chip (axon session): python scripts/roofline_shaper.py
On CPU backends the Pallas rows fall back to interpret mode and are
meaningless; the script skips them there.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np


# Exact per-element op counts for the shipped bank (C=64, W=8, depth 4),
# counting one VPU instruction per mul/add/fma (an fma is ONE VPU op;
# flops would be 2x) and S VPU ops per polynomial sine/cosine — the
# Horner degree-13 form is 1 mul + 1 round + 1 fma (reduce), 1 mul
# (r*r), 6 fma, 1 mul = 11 ops; `round` may lower to more than one op,
# so the sine microbenchmark below measures the real per-sine cost and
# the floor uses BOTH the 11-op count and the measured rate.
W = 8
SINE_OPS = 11


def shaper_op_counts():
    """(fwd_muls, fwd_sines, bwd_muls, bwd_sines) per (t, c) element.

    fwd: scale 1; L1 W fma + W sin; L2/L3 W*W fma + W sin each;
         L4 W fma + 1 sin; FiLM in/out 1 fma each.
    bwd (recompute-free part, as XLA runs it with stored activations):
         FiLM-out 2; L4: cos + 1 mul + W mul (dh3) + W fma (dw4) + 1
         (db4); L3/L2: W cos + W mul + 2*W*W fma + W add each;
         L1: W cos + W mul + 2*W fma + W add; scale 2; FiLM-in 3.
    A recomputing backward adds the fwd counts on top.
    """
    fwd_muls = 1 + W + W * W + W * W + W + 2
    fwd_sines = 3 * W + 1
    bwd_muls = (
        2
        + (1 + W + W + 1)
        + 2 * (W + 2 * W * W + W)
        + (W + 2 * W + W)
        + 2
        + 3
    )
    bwd_sines = 1 + W + W + W  # cosines, same polynomial cost
    return fwd_muls, fwd_sines, bwd_muls, bwd_sines


def main_impl(n_short, n_long, repeats, skip_pallas, batch, n_frames):
    import jax
    import jax.numpy as jnp

    from neural_waveshaping_synthesis_tpu.ops.fastmath import _fast_sin_poly
    from neural_waveshaping_synthesis_tpu.utils.profiling import (
        differential_scan_ms,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    dev = jax.devices()[0]
    print(f"[roofline] device={dev} backend={jax.default_backend()} "
          f"scan {n_short}/{n_long} best-of-{repeats}")

    rng = np.random.default_rng(0)
    results = {}

    # Every probe carries a SCALAR and folds its result to a scalar on
    # device: a large scan carry makes the differential fetch-dominated
    # garbage on this tunneled runtime (jax.device_get of a 384 MB
    # final carry swamps the scan-length difference — measured as
    # "negative time" and 10 GB/s "bandwidth" before this rewrite).
    def timed(name, body, work, unit, args=()):
        ms = differential_scan_ms(body, n_short, n_long, repeats, args=args)
        rate = work / (ms * 1e-3)
        results[name] = (ms, rate)
        print(f"  {name:<22} {ms:8.3f} ms   {rate / 1e9:9.2f} G{unit}/s")
        return ms, rate

    # ---- HBM read bandwidth ------------------------------------------------
    # One fused read+reduce pass. Write bandwidth can't be probed
    # honestly from inside one program (any consumer fuses with the
    # producer, eliding the write); the floor arithmetic assumes
    # write ~= read, which HBM2E supports.
    n_hbm = 96 * 1024 * 1024  # 384 MB f32
    x_hbm = jnp.asarray(rng.standard_normal((n_hbm // 128, 128)), jnp.float32)
    timed("hbm_read", lambda c, xx: jnp.sum(xx + c * 1e-30) * 1e-12,
          n_hbm * 4, "B", args=(x_hbm,))

    # ---- VPU fma chains ----------------------------------------------------
    K_FMA = 256
    n_fma = 8 * 1024 * 1024  # elements
    A = 0.99

    def fold(x):
        return jnp.sum(x).astype(jnp.float32) * 1e-30

    def fma_serial(c, xx, x0):
        x = xx + c * 1e-30
        for _ in range(K_FMA):
            x = x * A + x0
        return fold(x)

    def fma_ilp4(c, xx, x0):
        # four independent chains -> explicit instruction-level
        # parallelism; reports the aggregate rate (work = 4*n*K)
        xs_ = [xx + c * 1e-30, xx * 0.5, xx * 0.25, xx * 0.125]
        for _ in range(K_FMA):
            xs_ = [x * A + x0 for x in xs_]
        return sum(fold(x) for x in xs_)

    x128 = jnp.asarray(rng.standard_normal((n_fma // 128, 128)), jnp.float32)
    x64 = jnp.asarray(rng.standard_normal((n_fma // 64, 64)), jnp.float32)
    timed("fma128", fma_serial, n_fma * K_FMA, "fma", args=(x128, x128 * 0.01))
    timed("fma128_ilp4", fma_ilp4, 4 * n_fma * K_FMA, "fma",
          args=(x128, x128 * 0.01))
    timed("fma64", fma_serial, n_fma * K_FMA, "fma", args=(x64, x64 * 0.01))

    # ---- sine chains ---------------------------------------------------------
    K_SIN = 32

    def make_sin(fn):
        def body(c, xx, x0):
            x = xx + c * 1e-30
            for _ in range(K_SIN):
                x = fn(x) + x0
            return fold(x)
        return body

    xs = jnp.asarray(rng.standard_normal((n_fma // 128, 128)), jnp.float32)
    timed("psin128", make_sin(_fast_sin_poly), n_fma * K_SIN, "sin",
          args=(xs, xs * 1e-6))
    timed("xsin128", make_sin(jnp.sin), n_fma * K_SIN, "sin",
          args=(xs, xs * 1e-6))

    # ---- the same chains as trivial Pallas kernels ------------------------
    if not skip_pallas and on_tpu:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from neural_waveshaping_synthesis_tpu.kernels.newt_fused import _psin

        TILE = 1024

        def pallas_chain(chain_len, kind, lanes):
            def kernel(x_ref, x0_ref, o_ref):
                x, x0 = x_ref[:], x0_ref[:]
                for _ in range(chain_len):
                    x = x * A + x0 if kind == "fma" else _psin(x) + x0
                o_ref[:] = x

            def call(x, x0):
                rows = x.shape[0]
                spec = pl.BlockSpec((TILE, lanes), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
                return pl.pallas_call(
                    kernel,
                    grid=(rows // TILE,),
                    in_specs=[spec, spec],
                    out_specs=spec,
                    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                )(x, x0)

            return call

        def wrap(call):
            def body(c, xx, x0):
                return fold(call(xx + c * 1e-30, x0))
            return body

        pf128 = pallas_chain(K_FMA, "fma", 128)
        timed("pallas_fma128", wrap(pf128), n_fma * K_FMA, "fma",
              args=(x128, x128 * 0.01))
        pf64 = pallas_chain(K_FMA, "fma", 64)
        timed("pallas_fma64", wrap(pf64), n_fma * K_FMA, "fma",
              args=(x64, x64 * 0.01))
        ps128 = pallas_chain(K_SIN, "sin", 128)
        timed("pallas_psin128", wrap(ps128), n_fma * K_SIN, "sin",
              args=(xs, xs * 1e-6))
    else:
        print("  (pallas microbenchmarks skipped: CPU backend)")

    # ---- the shaper bank at canonical shape -------------------------------
    from neural_waveshaping_synthesis_tpu.models import TrainableNonlinearity
    from neural_waveshaping_synthesis_tpu.kernels import newt_fused

    b, ta, c = batch, n_frames * 128, 64
    shaper = TrainableNonlinearity(c, W, depth=4)
    p = shaper.init(jax.random.PRNGKey(0))
    exc = jnp.asarray(rng.standard_normal((b, ta, c)) * 0.3, jnp.float32)
    film = jnp.asarray(rng.standard_normal((b, ta, 4 * c)), jnp.float32)
    n_elem = b * ta * c

    def film_shaper(pp, x, f):
        gi, bi = f[..., :c], f[..., c:2 * c]
        gn, bn = f[..., 2 * c:3 * c], f[..., 3 * c:]
        return gn * shaper.apply(pp, gi * x + bi) + bn

    def dep(x, cr):
        return x + (cr * 1e-30).astype(x.dtype)

    def fold(x):
        return jnp.sum(x).astype(jnp.float32) * 1e-30

    def p_fwd(cr, e, f):
        return fold(film_shaper(p, dep(e, cr), f))

    def p_fwd_bwd(cr, e, f):
        out, vjp = jax.vjp(
            lambda pp, x: jnp.sum(film_shaper(pp, x, f)), p, dep(e, cr)
        )
        grads = vjp(jnp.float32(1.0))
        return out * 1e-30 + sum(
            jnp.sum(g) for g in jax.tree_util.tree_leaves(grads)
        ) * 1e-30

    weights = newt_fused.pack_weights(p)
    weights_fl = newt_fused.pack_weights_fl(p)

    def make_fused_probes(fn, w):
        def p_fused_fwd(cr, e, f):
            return fold(fn(dep(e, cr), f, w))

        def p_fused_fwd_bwd(cr, e, f):
            out, vjp = jax.vjp(
                lambda x, ff: jnp.sum(fn(x, ff, w)), dep(e, cr), f,
            )
            grads = vjp(jnp.float32(1.0))
            return out * 1e-30 + sum(
                jnp.sum(g) for g in jax.tree_util.tree_leaves(grads)
            ) * 1e-30

        return p_fused_fwd, p_fused_fwd_bwd

    p_fused_fwd, p_fused_fwd_bwd = make_fused_probes(
        newt_fused.film_shaper_fused, weights
    )
    p_fl_fwd, p_fl_fwd_bwd = make_fused_probes(
        newt_fused.film_shaper_fused_fl, weights_fl
    )

    shaper_rows = [("shaper_fwd", p_fwd), ("shaper_fwd_bwd", p_fwd_bwd)]
    if not skip_pallas and on_tpu:
        shaper_rows += [
            ("shaper_fused_fwd", p_fused_fwd),
            ("shaper_fused_fwd_bwd", p_fused_fwd_bwd),
            ("shaper_fused_fl_fwd", p_fl_fwd),
            ("shaper_fused_fl_fwd_bwd", p_fl_fwd_bwd),
        ]
    print(f"[roofline] shaper probes at B={b} T={ta} C={c} "
          f"({n_elem / 1e6:.1f}M elements)")
    for name, body in shaper_rows:
        ms = differential_scan_ms(body, n_short, n_long, repeats,
                                  args=(exc, film))
        results[name] = (ms, 0.0)
        print(f"  {name:<22} {ms:8.3f} ms")

    # ---- the floor arithmetic ---------------------------------------------
    # Ceilings = the BEST rate any probe achieved (the chip can go at
    # least that fast; a floor from an underestimated ceiling would
    # overstate how close the implementation is).
    fwd_m, fwd_s, bwd_m, bwd_s = shaper_op_counts()
    fma_rate = max(
        results[k][1]
        for k in ("fma128", "fma128_ilp4", "pallas_fma128")
        if k in results
    )
    sin_rate = max(
        results[k][1]
        for k in ("psin128", "pallas_psin128")
        if k in results
    )
    bw = results["hbm_read"][1]              # bytes/s (read; write ~= read)

    def floor_ms(muls, sines, bytes_per_elem):
        compute = (n_elem * muls / fma_rate + n_elem * sines / sin_rate)
        memory = n_elem * bytes_per_elem / bw
        return compute * 1e3, memory * 1e3

    # fwd: read exc (4B) + film (16B), write out (4B) = 24 B/elem
    cf, mf = floor_ms(fwd_m, fwd_s, 24)
    # fwd+bwd, recomputing backward (the fused kernel's strategy):
    #   fwd pass + recompute + backprop arithmetic;
    #   bytes: fwd 24 + bwd read exc+film+dy (24) + write dexc (4)
    #   + dfilm (16) = 68 B/elem
    cb, mb = floor_ms(fwd_m + (fwd_m + bwd_m), fwd_s + (fwd_s + bwd_s), 68)
    meas_f = min(
        results[k][0]
        for k in ("shaper_fwd", "shaper_fused_fwd", "shaper_fused_fl_fwd")
        if k in results
    )
    meas_b = min(
        results[k][0]
        for k in ("shaper_fwd_bwd", "shaper_fused_fwd_bwd",
                  "shaper_fused_fl_fwd_bwd")
        if k in results
    )
    print("[roofline] FiLM+shaper+FiLM floors at measured ceilings "
          f"(fma {fma_rate/1e9:.0f} G/s, psin {sin_rate/1e9:.1f} G/s, "
          f"hbm {bw/1e9:.0f} GB/s); measured = best formulation present:")
    print(f"  fwd:     compute {cf:6.2f} ms | memory {mf:6.2f} ms | "
          f"floor {max(cf, mf):6.2f} ms | measured {meas_f:6.2f} ms "
          f"({meas_f / max(cf, mf):4.1f}x floor)")
    print(f"  fwd+bwd: compute {cb:6.2f} ms | memory {mb:6.2f} ms | "
          f"floor {max(cb, mb):6.2f} ms | measured {meas_b:6.2f} ms "
          f"({meas_b / max(cb, mb):4.1f}x floor)")
    print("  (op counts/elem: fwd %d mul+ %d sin; bwd adds %d mul + %d cos;"
          " recompute doubles fwd)" % (fwd_m, fwd_s, bwd_m, bwd_s))
    return results


@click.command()
@click.option("--n-short", default=5)
@click.option("--n-long", default=25)
@click.option("--repeats", default=3)
@click.option("--skip-pallas", is_flag=True)
@click.option("--batch", default=8)
@click.option("--n-frames", default=500)
def main(n_short, n_long, repeats, skip_pallas, batch, n_frames):
    main_impl(n_short, n_long, repeats, skip_pallas, batch, n_frames)


if __name__ == "__main__":
    main()
