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
    the kernel's backward is hand-written (cos factors below).

    Evaluated in f32 whatever the input dtype: Mosaic cannot legalize
    `math.roundeven` on bf16 vectors (compile error, v5e 2026-08-18),
    and a bf16 range reduction would be numerically useless anyway.
    f32 inputs see the identical program (the casts are no-ops)."""
    x32 = x.astype(jnp.float32)
    r = x32 - TAU * jnp.round(x32 * _INV_TAU)
    s = r * r
    p = jnp.float32(_SIN_ODD_COEFFS[-1])
    for c in _SIN_ODD_COEFFS[-2::-1]:
        p = p * s + c
    return (r * p).astype(x.dtype)


def _pcos(x):
    x32 = x.astype(jnp.float32)
    r = x32 - TAU * jnp.round(x32 * _INV_TAU)
    s = r * r
    p = jnp.float32(_COS_EVEN_COEFFS[-1])
    for c in _COS_EVEN_COEFFS[-2::-1]:
        p = p * s + c
    return p.astype(x.dtype)


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
def _forward_core(exc, gi, bi, gn, bn, scale, w1, b1, w2, b2, w3, b3, w4, b4):
    """Shared fwd math on a (T, L) tile (L = C half-lane or 2C
    full-lane with lane-tiled weights); returns intermediates for bwd."""
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


def _split_film(film):
    """(T, 4C) film tile -> gi, bi, gn, bn (T, C) planes."""
    return (
        film[:, :C],
        film[:, C : 2 * C],
        film[:, 2 * C : 3 * C],
        film[:, 3 * C :],
    )


def _split_film_fl(film2):
    """(T, 8C) row-pair-interleaved film tile -> 4 full-lane (T, 2C)
    planes aligned with the (T, 2C) exciter layout.

    ``film2`` is film.reshape(R//2, 8C): lane block [0:4C] holds the
    even row's [gi|bi|gn|bn], block [4C:8C] the odd row's. Plane a is
    the concat of lanes [a*C:(a+1)*C] and [4C+a*C:4C+(a+1)*C]."""
    planes = []
    for a in range(4):
        planes.append(
            jnp.concatenate(
                [
                    film2[:, a * C : (a + 1) * C],
                    film2[:, 4 * C + a * C : 4 * C + (a + 1) * C],
                ],
                axis=1,
            )
        )
    return tuple(planes)


def _merge_film_fl(dgi, dbi, dgn, dbn):
    """Inverse of _split_film_fl for the film cotangent."""
    return jnp.concatenate(
        [
            dgi[:, :C], dbi[:, :C], dgn[:, :C], dbn[:, :C],
            dgi[:, C:], dbi[:, C:], dgn[:, C:], dbn[:, C:],
        ],
        axis=1,
    )


def _fwd_kernel(
    exc_ref, film_ref, scale_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    w3_ref, b3_ref, w4_ref, b4_ref, out_ref,
):
    gi, bi, gn, bn = _split_film(film_ref[:])
    out, _ = _forward_core(
        exc_ref[:], gi, bi, gn, bn, scale_ref[:], w1_ref[:], b1_ref[:],
        w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:], w4_ref[:], b4_ref[:],
    )
    out_ref[:] = out


def _fwd_kernel_fl(
    exc_ref, film_ref, scale_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    w3_ref, b3_ref, w4_ref, b4_ref, out_ref,
):
    gi, bi, gn, bn = _split_film_fl(film_ref[:])
    out, _ = _forward_core(
        exc_ref[:], gi, bi, gn, bn, scale_ref[:], w1_ref[:], b1_ref[:],
        w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:], w4_ref[:], b4_ref[:],
    )
    out_ref[:] = out


def _bwd_core(
    exc, film_planes, dy, scale, w1, b1, w2, b2, w3, b3, w4, b4
):
    """Recompute-forward backward on one tile; returns
    (dexc, (dgi, dbi, dgn, dbn), weight-grad planes)."""
    gi_in, bi_in, gn_in, bn_in = film_planes
    out, res = _forward_core(
        exc, gi_in, bi_in, gn_in, bn_in, scale, w1, b1, w2, b2, w3, b3,
        w4, b4,
    )
    x, h0, p1, h1, p2, h2, p3, h3, p4, s, gi, gn = res

    # Weight-grad reductions run in f32 whatever the activation dtype:
    # each tile's (rows,) sum AND the cross-grid accumulation (2000
    # tiles at canonical shape) would otherwise compound bf16's 8-bit
    # mantissa into O(1) relative error. Matches the XLA chain, whose
    # einsum weight grads accumulate f32 on the MXU under bf16.
    def rsum(v):
        return jnp.sum(v.astype(jnp.float32), axis=0)

    # FiLM-out backward
    ds = dy * gn
    dgn = dy * s
    dbn = dy

    # layer 4 backward
    dp4 = ds * _pcos(p4)
    dh3 = [dp4 * w4[w] for w in range(W)]
    dw4 = jnp.stack([rsum(dp4 * h3[w]) for w in range(W)])  # (W, C)
    db4 = rsum(dp4)[None, :]

    # layer 3 backward
    dp3 = [dh3[v] * _pcos(p3[v]) for v in range(W)]
    dh2 = [
        sum(dp3[v] * w3[w * W + v] for v in range(W)) for w in range(W)
    ]
    dw3 = jnp.stack(
        [rsum(dp3[i % W] * h2[i // W]) for i in range(W * W)]
    )  # rows w*W+v
    db3 = jnp.stack([rsum(dp3[v]) for v in range(W)])

    # layer 2 backward
    dp2 = [dh2[v] * _pcos(p2[v]) for v in range(W)]
    dh1 = [
        sum(dp2[v] * w2[w * W + v] for v in range(W)) for w in range(W)
    ]
    dw2 = jnp.stack(
        [rsum(dp2[i % W] * h1[i // W]) for i in range(W * W)]
    )
    db2 = jnp.stack([rsum(dp2[v]) for v in range(W)])

    # layer 1 backward
    dp1 = [dh1[w] * _pcos(p1[w]) for w in range(W)]
    dh0 = sum(dp1[w] * w1[w] for w in range(W))
    dw1 = jnp.stack([rsum(dp1[w] * h0) for w in range(W)])
    db1 = jnp.stack([rsum(dp1[w]) for w in range(W)])

    # input scale + FiLM-in backward
    dscale = rsum(dh0 * x)[None, :]
    dx = dh0 * scale[0]
    dgi = dx * exc
    dbi = dx
    dexc = dx * gi
    wgrads = (dscale, dw1, db1, dw2, db2, dw3, db3, dw4, db4)
    return dexc, (dgi, dbi, dgn, dbn), wgrads


def _accumulate_wgrads(wgrads, wgrad_refs):
    """Weight grads accumulate across the sequential TPU grid."""
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in wgrad_refs:
            ref[:] = jnp.zeros_like(ref)

    for g, ref in zip(wgrads, wgrad_refs):
        ref[:] += g


def _bwd_kernel(
    exc_ref, film_ref, dy_ref, scale_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    w3_ref, b3_ref, w4_ref, b4_ref,
    dexc_ref, dfilm_ref, dscale_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dw3_ref, db3_ref, dw4_ref, db4_ref,
):
    dexc, (dgi, dbi, dgn, dbn), wgrads = _bwd_core(
        exc_ref[:], _split_film(film_ref[:]), dy_ref[:], scale_ref[:],
        w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:],
        w4_ref[:], b4_ref[:],
    )
    dexc_ref[:] = dexc
    dfilm_ref[:] = jnp.concatenate([dgi, dbi, dgn, dbn], axis=1)
    _accumulate_wgrads(
        wgrads,
        (dscale_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
         dw4_ref, db4_ref),
    )


def _bwd_kernel_fl(
    exc_ref, film_ref, dy_ref, scale_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    w3_ref, b3_ref, w4_ref, b4_ref,
    dexc_ref, dfilm_ref, dscale_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dw3_ref, db3_ref, dw4_ref, db4_ref,
):
    dexc, (dgi, dbi, dgn, dbn), wgrads = _bwd_core(
        exc_ref[:], _split_film_fl(film_ref[:]), dy_ref[:], scale_ref[:],
        w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:],
        w4_ref[:], b4_ref[:],
    )
    dexc_ref[:] = dexc
    dfilm_ref[:] = _merge_film_fl(dgi, dbi, dgn, dbn)
    _accumulate_wgrads(
        wgrads,
        (dscale_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
         dw4_ref, db4_ref),
    )


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


def _w_shapes(lanes):
    return [(1, lanes), (W, lanes), (W, lanes), (W * W, lanes), (W, lanes),
            (W * W, lanes), (W, lanes), (W, lanes), (1, lanes)]


def _run_fwd(exc2, film2, weights, tile, interpret, lanes=C):
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

    out = pl.pallas_call(
        _fwd_kernel if lanes == C else _fwd_kernel_fl,
        grid=(n_tiles,),
        in_specs=[row_spec(lanes), row_spec(4 * lanes)]
        + [w_spec(s) for s in _w_shapes(lanes)],
        out_specs=row_spec(lanes),
        out_shape=jax.ShapeDtypeStruct((exc_p.shape[0], lanes), exc2.dtype),
        interpret=interpret,
    )(exc_p, film_p, *weights)
    return out[:rows]


def _run_bwd(exc2, film2, dy2, weights, tile, interpret, lanes=C):
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
    w_shapes = _w_shapes(lanes)

    outs = pl.pallas_call(
        _bwd_kernel if lanes == C else _bwd_kernel_fl,
        grid=(n_tiles,),
        in_specs=[row_spec(lanes), row_spec(4 * lanes), row_spec(lanes)]
        + [w_spec(s) for s in w_shapes],
        out_specs=[row_spec(lanes), row_spec(4 * lanes)]
        + [w_spec(s) for s in w_shapes],
        out_shape=[
            jax.ShapeDtypeStruct((exc_p.shape[0], lanes), exc2.dtype),
            jax.ShapeDtypeStruct((exc_p.shape[0], 4 * lanes), exc2.dtype),
        ]
        # weight-grad planes are f32 regardless of activation dtype
        # (see _bwd_core rsum); cast to the primal dtype once at the
        # end so the custom-VJP cotangents type-match the weights.
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes],
        interpret=interpret,
    )(exc_p, film_p, dy_p, *weights)
    dexc, dfilm = outs[0][:rows], outs[1][:rows]
    return dexc, dfilm, tuple(o.astype(exc2.dtype) for o in outs[2:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def film_shaper_fused(
    exciter: jnp.ndarray,
    film: jnp.ndarray,
    weights: Tuple[jnp.ndarray, ...],
    tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, T, C) exciter + (B, T, 4C) film + packed weights ->
    (B, T, C) shaped-and-renormalized signal (pre-mixer).

    Tile default from the same sweep as the full-lane variant: this
    half-lane form measures 12.0/14.8/20.7 ms fwd at tile 128/256/512
    (canonical shape, v5e, 2026-08-18, shaper-only probe). At its old
    512 default it lost to the XLA chain (13.7 ms); tile 128 edges the
    chain but still trails the full-lane kernel (7.1 ms) ~1.7x — the
    Mosaic half-lane codegen penalty. Kept as the simpler-layout
    baseline."""
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


# ---------------------------------------------------------------------------
# full-lane variant: pair adjacent (b*t) rows into the 128 lanes
# ---------------------------------------------------------------------------
def pack_weights_fl(p: Dict) -> Tuple[jnp.ndarray, ...]:
    """pack_weights with every (k, C) plane lane-tiled to (k, 2C).

    The full-lane kernels view the (R, C) activations as (R/2, 2C) —
    a FREE reshape (row-major) that fills all 128 vector lanes instead
    of 64; lane l then holds channel l % C, so each weight row simply
    repeats. Weight-grad cotangents come back (k, 2C) and the tile's
    VJP (sum of both halves) restores (k, C) automatically under AD.
    """
    return tuple(
        jnp.concatenate([w, w], axis=-1) for w in pack_weights(p)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def film_shaper_fused_fl(
    exciter: jnp.ndarray,
    film: jnp.ndarray,
    weights_fl: Tuple[jnp.ndarray, ...],
    tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full-lane film_shaper_fused: same math, (R/2, 2C) layout.

    ``weights_fl`` from :func:`pack_weights_fl`. Requires b*t even
    (every real shape is; control hops are powers of two).

    Tile default from a measured sweep at canonical train shape
    (B=8 x 64k, v5e, 2026-08-18): fwd 7.92/7.24/7.06/8.60/11.5/16.1 ms
    at tile 32/64/128/256/512/1024 — small tiles keep the whole
    K-deep elementwise chain's working set near the register file
    instead of streaming every intermediate through VMEM; 1024+ rows
    overflow the 16 MB scoped-VMEM budget in the backward.
    """
    b, t, c = exciter.shape
    assert c == C and (b * t) % 2 == 0
    out = _run_fwd(
        exciter.reshape(b * t // 2, 2 * c),
        film.reshape(b * t // 2, 8 * c),
        weights_fl,
        tile,
        interpret,
        lanes=2 * C,
    )
    return out.reshape(b, t, c)


def _fused_fwd_fl(exciter, film, weights_fl, tile, interpret):
    return (
        film_shaper_fused_fl(exciter, film, weights_fl, tile, interpret),
        (exciter, film, weights_fl),
    )


def _fused_bwd_fl(tile, interpret, residuals, dy):
    exciter, film, weights_fl = residuals
    b, t, c = exciter.shape
    # measured sweep (canonical shape, v5e, 2026-08-18): bwd-only
    # 14.8/13.1/12.3/12.3 ms at tile 32/64/128/256 — 128 is the knee
    bwd_tile = min(tile, 128)
    dexc, dfilm, dw = _run_bwd(
        exciter.reshape(b * t // 2, 2 * c),
        film.reshape(b * t // 2, 8 * c),
        dy.reshape(b * t // 2, 2 * c),
        weights_fl,
        bwd_tile,
        interpret,
        lanes=2 * C,
    )
    return (
        dexc.reshape(b, t, c),
        dfilm.reshape(b, t, 4 * c),
        dw,
    )


film_shaper_fused_fl.defvjp(_fused_fwd_fl, _fused_bwd_fl)
