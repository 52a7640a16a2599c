"""Fused NEWT audio-rate chain as a Pallas TPU kernel with custom VJP.

The chain FiLM-in -> per-channel sine MLP (1->8->8->8->1) -> FiLM-out
is the hot audio-rate computation (reference shaping.py:67-79). In
XLA's lowering its intermediate activations (B*T, 64, 8) materialize in
HBM — ~1 GB per mid layer at batch 8 — making the shaper the single
most expensive component of the training step (~99 ms of 148 ms) and
a large share of inference.

This kernel keeps every intermediate in VMEM:
  * forward: read exciter (R, 64) + FiLM params (R, 256), write (R, 64);
  * backward: RECOMPUTES the forward per tile (cheap VPU work) instead
    of loading saved activations, producing d_exciter, d_film, and the
    weight gradients, which accumulate across the (sequential) grid in
    a VMEM-resident output block.

Specialized to the shipped architecture (depth 4, width 8, sine
activations); callers fall back to the XLA path for other configs.

Weight layout inside the kernel: width-major planes so every operation
is a (TILE, 64) VPU op with a broadcast (64,) weight row:
  scale (1, 64)          input_scale
  w1 (8, 64), b1 (8, 64) layer 1 (1 -> 8)
  w2 (64, 64), b2 (8, 64) layer 2 (8 -> 8), rows indexed w*8+v
  w3 (64, 64), b3 (8, 64) layer 3 (8 -> 8)
  w4 (8, 64), b4 (1, 64) layer 4 (8 -> 1)
"""
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.fastmath import TAU, _INV_TAU, _SIN_ODD_COEFFS, _COS_EVEN_COEFFS

C = 64
W = 8
DEPTH = 4


def _psin(x):
    """Polynomial sine, inlined for Mosaic (ops/fastmath.py fast_sin).

    Mosaic's `sin` lowering is slower than XLA's (measured — it was why
    kernel v1 lost to the XLA chain at 58 vs 24 ms fwd in the exact-sin
    era); the Horner form is pure VPU mul/add. No custom_jvp wrapper:
    the kernel's backward is hand-written (cos factors below)."""
    r = x - TAU * jnp.round(x * _INV_TAU)
    s = r * r
    p = jnp.asarray(_SIN_ODD_COEFFS[-1], x.dtype)
    for c in _SIN_ODD_COEFFS[-2::-1]:
        p = p * s + c
    return r * p


def _pcos(x):
    r = x - TAU * jnp.round(x * _INV_TAU)
    s = r * r
    p = jnp.asarray(_COS_EVEN_COEFFS[-1], x.dtype)
    for c in _COS_EVEN_COEFFS[-2::-1]:
        p = p * s + c
    return p


def supports(shaper_cfg) -> bool:
    """True when the shipped architecture matches this kernel."""
    return (
        shaper_cfg.channels == C
        and shaper_cfg.width == W
        and shaper_cfg.depth == DEPTH
        and shaper_cfg.nonlinearity == "sine"
        and shaper_cfg.final_nonlinearity == "sine"
    )


# ---------------------------------------------------------------------------
# weight packing
# ---------------------------------------------------------------------------
def pack_weights(p: Dict) -> Tuple[jnp.ndarray, ...]:
    """Shaper params (models/modules.py layout) -> kernel planes."""
    l1, l2, l3, l4 = p["layers"]
    return (
        p["input_scale"][None, :],  # (1, C)
        l1["w"][:, 0, :].T,  # (W, C)
        l1["b"].T,  # (W, C)
        l2["w"].transpose(1, 2, 0).reshape(W * W, C),  # rows w*W+v
        l2["b"].T,
        l3["w"].transpose(1, 2, 0).reshape(W * W, C),
        l3["b"].T,
        l4["w"][:, :, 0].T,  # (W, C)
        l4["b"].T,  # (1, C)
    )


def unpack_weight_grads(grads: Tuple[jnp.ndarray, ...]) -> Dict:
    """Kernel-plane gradients -> shaper params pytree layout."""
    dscale, dw1, db1, dw2, db2, dw3, db3, dw4, db4 = grads
    return {
        "input_scale": dscale[0],
        "layers": [
            {"w": dw1.T[:, None, :], "b": db1.T},
            {"w": dw2.reshape(W, W, C).transpose(2, 0, 1), "b": db2.T},
            {"w": dw3.reshape(W, W, C).transpose(2, 0, 1), "b": db3.T},
            {"w": dw4.T[:, :, None], "b": db4.T},
        ],
    }


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def _forward_core(exc, film, scale, w1, b1, w2, b2, w3, b3, w4, b4):
    """Shared fwd math on a (T, C) tile; returns intermediates for bwd."""
    gi, bi = film[:, :C], film[:, C : 2 * C]
    gn, bn = film[:, 2 * C : 3 * C], film[:, 3 * C :]
    x = gi * exc + bi
    h0 = x * scale[0]
    p1 = [h0 * w1[w] + b1[w] for w in range(W)]
    h1 = [_psin(p) for p in p1]
    p2 = [
        sum(h1[w] * w2[w * W + v] for w in range(W)) + b2[v] for v in range(W)
    ]
    h2 = [_psin(p) for p in p2]
    p3 = [
        sum(h2[w] * w3[w * W + v] for w in range(W)) + b3[v] for v in range(W)
    ]
    h3 = [_psin(p) for p in p3]
    p4 = sum(h3[w] * w4[w] for w in range(W)) + b4[0]
    s = _psin(p4)
    out = gn * s + bn
    return out, (x, h0, p1, h1, p2, h2, p3, h3, p4, s, gi, gn)


def _fwd_kernel(
    exc_ref, film_ref, scale_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    w3_ref, b3_ref, w4_ref, b4_ref, out_ref,
):
    out, _ = _forward_core(
        exc_ref[:], film_ref[:], scale_ref[:], w1_ref[:], b1_ref[:],
        w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:], w4_ref[:], b4_ref[:],
    )
    out_ref[:] = out


def _bwd_kernel(
    exc_ref, film_ref, dy_ref, scale_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    w3_ref, b3_ref, w4_ref, b4_ref,
    dexc_ref, dfilm_ref, dscale_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dw3_ref, db3_ref, dw4_ref, db4_ref,
):
    from jax.experimental import pallas as pl

    exc, film, dy = exc_ref[:], film_ref[:], dy_ref[:]
    scale, w1, w2, w3, w4 = (
        scale_ref[:], w1_ref[:], w2_ref[:], w3_ref[:], w4_ref[:]
    )
    out, res = _forward_core(
        exc, film, scale, w1, b1_ref[:], w2, b2_ref[:], w3, b3_ref[:],
        w4, b4_ref[:],
    )
    x, h0, p1, h1, p2, h2, p3, h3, p4, s, gi, gn = res

    # FiLM-out backward
    ds = dy * gn
    dgn = dy * s
    dbn = dy

    # layer 4 backward
    dp4 = ds * _pcos(p4)
    dh3 = [dp4 * w4[w] for w in range(W)]
    dw4 = jnp.stack([jnp.sum(dp4 * h3[w], axis=0) for w in range(W)])  # (W, C)
    db4 = jnp.sum(dp4, axis=0)[None, :]

    # layer 3 backward
    dp3 = [dh3[v] * _pcos(p3[v]) for v in range(W)]
    dh2 = [
        sum(dp3[v] * w3[w * W + v] for v in range(W)) for w in range(W)
    ]
    dw3 = jnp.stack(
        [jnp.sum(dp3[i % W] * h2[i // W], axis=0) for i in range(W * W)]
    )  # rows w*W+v
    db3 = jnp.stack([jnp.sum(dp3[v], axis=0) for v in range(W)])

    # layer 2 backward
    dp2 = [dh2[v] * _pcos(p2[v]) for v in range(W)]
    dh1 = [
        sum(dp2[v] * w2[w * W + v] for v in range(W)) for w in range(W)
    ]
    dw2 = jnp.stack(
        [jnp.sum(dp2[i % W] * h1[i // W], axis=0) for i in range(W * W)]
    )
    db2 = jnp.stack([jnp.sum(dp2[v], axis=0) for v in range(W)])

    # layer 1 backward
    dp1 = [dh1[w] * _pcos(p1[w]) for w in range(W)]
    dh0 = sum(dp1[w] * w1[w] for w in range(W))
    dw1 = jnp.stack([jnp.sum(dp1[w] * h0, axis=0) for w in range(W)])
    db1 = jnp.stack([jnp.sum(dp1[w], axis=0) for w in range(W)])

    # input scale + FiLM-in backward
    dscale = jnp.sum(dh0 * x, axis=0)[None, :]
    dx = dh0 * scale[0]
    dgi = dx * exc
    dbi = dx
    dexc_ref[:] = dx * gi
    dfilm_ref[:] = jnp.concatenate([dgi, dbi, dgn, dbn], axis=1)

    # weight grads accumulate across the sequential grid
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        db3_ref[:] = jnp.zeros_like(db3_ref)
        dw4_ref[:] = jnp.zeros_like(dw4_ref)
        db4_ref[:] = jnp.zeros_like(db4_ref)

    dscale_ref[:] += dscale
    dw1_ref[:] += dw1
    db1_ref[:] += db1
    dw2_ref[:] += dw2
    db2_ref[:] += db2
    dw3_ref[:] += dw3
    db3_ref[:] += db3
    dw4_ref[:] += dw4
    db4_ref[:] += db4


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------
def _pad_rows(a: jnp.ndarray, tile: int) -> jnp.ndarray:
    pad = (-a.shape[0]) % tile
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
    return a


def _interpret_here(interpret: bool) -> bool:
    """Pallas TPU kernels only run compiled on TPU; on the CPU backend
    (tests, the forced-CPU harness) fall back to interpret mode so the
    fused path works everywhere instead of erroring."""
    return interpret or jax.default_backend() == "cpu"


def _run_fwd(exc2, film2, weights, tile, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = _interpret_here(interpret)
    rows = exc2.shape[0]
    exc_p, film_p = _pad_rows(exc2, tile), _pad_rows(film2, tile)
    n_tiles = exc_p.shape[0] // tile

    row_spec = lambda width: pl.BlockSpec(
        (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    w_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    w_shapes = [(1, C), (W, C), (W, C), (W * W, C), (W, C), (W * W, C),
                (W, C), (W, C), (1, C)]

    out = pl.pallas_call(
        _fwd_kernel,
        grid=(n_tiles,),
        in_specs=[row_spec(C), row_spec(4 * C)] + [w_spec(s) for s in w_shapes],
        out_specs=row_spec(C),
        out_shape=jax.ShapeDtypeStruct((exc_p.shape[0], C), exc2.dtype),
        interpret=interpret,
    )(exc_p, film_p, *weights)
    return out[:rows]


def _run_bwd(exc2, film2, dy2, weights, tile, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = _interpret_here(interpret)
    rows = exc2.shape[0]
    exc_p = _pad_rows(exc2, tile)
    film_p = _pad_rows(film2, tile)
    dy_p = _pad_rows(dy2, tile)
    n_tiles = exc_p.shape[0] // tile

    row_spec = lambda width: pl.BlockSpec(
        (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    w_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    w_shapes = [(1, C), (W, C), (W, C), (W * W, C), (W, C), (W * W, C),
                (W, C), (W, C), (1, C)]

    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(n_tiles,),
        in_specs=[row_spec(C), row_spec(4 * C), row_spec(C)]
        + [w_spec(s) for s in w_shapes],
        out_specs=[row_spec(C), row_spec(4 * C)] + [w_spec(s) for s in w_shapes],
        out_shape=[
            jax.ShapeDtypeStruct((exc_p.shape[0], C), exc2.dtype),
            jax.ShapeDtypeStruct((exc_p.shape[0], 4 * C), exc2.dtype),
        ]
        + [jax.ShapeDtypeStruct(s, exc2.dtype) for s in w_shapes],
        interpret=interpret,
    )(exc_p, film_p, dy_p, *weights)
    dexc, dfilm = outs[0][:rows], outs[1][:rows]
    return dexc, dfilm, tuple(outs[2:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def film_shaper_fused(
    exciter: jnp.ndarray,
    film: jnp.ndarray,
    weights: Tuple[jnp.ndarray, ...],
    tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, T, C) exciter + (B, T, 4C) film + packed weights ->
    (B, T, C) shaped-and-renormalized signal (pre-mixer)."""
    b, t, c = exciter.shape
    out = _run_fwd(
        exciter.reshape(b * t, c), film.reshape(b * t, 4 * c), weights,
        tile, interpret,
    )
    return out.reshape(b, t, c)


def _fused_fwd(exciter, film, weights, tile, interpret):
    return film_shaper_fused(exciter, film, weights, tile, interpret), (
        exciter,
        film,
        weights,
    )


def _fused_bwd(tile, interpret, residuals, dy):
    exciter, film, weights = residuals
    b, t, c = exciter.shape
    # the backward holds ~9 width-planes of intermediates per tile; a
    # 1024-row tile overflows the 16 MB scoped-VMEM budget (36 MB asked)
    bwd_tile = min(tile, 256)
    dexc, dfilm, dw = _run_bwd(
        exciter.reshape(b * t, c),
        film.reshape(b * t, 4 * c),
        dy.reshape(b * t, c),
        weights,
        bwd_tile,
        interpret,
    )
    return dexc.reshape(b, t, c), dfilm.reshape(b, t, 4 * c), dw


film_shaper_fused.defvjp(_fused_fwd, _fused_bwd)
