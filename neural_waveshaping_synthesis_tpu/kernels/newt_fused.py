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


# ---------------------------------------------------------------------------
# control-rate variant: the FiLM upsample folded into the kernel
# ---------------------------------------------------------------------------
# The full-lane kernel above still reads its FiLM parameters at AUDIO
# rate: the (B, Ta, 4C) array (524 MB f32 at the canonical train shape)
# is materialized in HBM by the XLA upsample program, read by the fwd
# kernel, read AGAIN by the recomputing bwd kernel, and its (B, Ta, 4C)
# cotangent is written back and segment-summed by an XLA transpose —
# ~2.6 GB of traffic whose only content is 4 MB of control-rate frames
# linearly interpolated (reference shaping.py:69 upsamples the same
# way). This variant takes the film at CONTROL rate and interpolates
# in-kernel.
#
# Geometry: tile = hop full-lane rows = 2*hop audio samples = exactly 2
# control hops. The control film is padded with ONE replicated frame at
# each end (padded row p holds frame p-1), which makes the
# align_corners=False edge clamping automatic; tile j then needs padded
# frames [2j, 2j+4). Mosaic requires block sublane dims divisible by 8
# or equal to the array dim, so overlapping height-2 blocks of the
# padded array don't lower; instead `_windows_cr` pre-builds a
# (B*tiles, 4, 4C) per-tile window array with four strided slices
# (gather-free, control-rate — 16 MB vs the 524 MB it replaces) whose
# (1, 4, 4C) blocks are legal (4 == array dim). The interpolation
# weight is computed with the same single f32 division as
# ops/upsample.py _linear_upsample_integer, so the f32 forward is
# BIT-identical to linear_upsample + chain (tested).
def _interp_w_cr(hop, is_first, dtype):
    """Per-element (hop, 2C) interpolation state for one tile.

    Returns (irel, w): irel in {0,1,2} indexes the left padded frame
    relative to the tile's first block row; w is the lerp weight in
    ``dtype``, computed exactly as _linear_upsample_integer's
    ``(2o+1±hop)/(2*hop)`` (one division of exact-integer f32
    operands). The head clamp (first half-hop of the clip copies frame
    0 exactly) is folded in as w=0 — left*(1-0)+right*0 ≡ left
    bit-exactly, matching the chain's explicit head select."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (hop, 2 * C), 0)
    half = (jax.lax.broadcasted_iota(jnp.int32, (hop, 2 * C), 1) >= C)
    u = 2 * rows + half.astype(jnp.int32)  # audio sample within tile
    num = (2 * u + 1 + hop).astype(jnp.float32)  # exact ints < 2^24
    den = jnp.float32(2 * hop)
    irel = jnp.floor(num / den)  # {0., 1., 2.}; exact at multiples
    w32 = (num - irel * den) / den  # single division, chain-exact
    head = (2 * u + 1 < hop) & is_first
    w32 = jnp.where(head, jnp.float32(0.0), w32)
    return irel.astype(jnp.int32), w32.astype(dtype), w32


def _film_planes_cr(win, irel, w32, out_dtype):
    """(4, 4C) padded-frame window -> 4 full-lane (hop, 2C) film planes.

    ``win`` holds padded frames [2j, 2j+4) for tile j; each frame's
    per-param (1, C) row is lane-tiled to (1, 2C) (both lane halves
    carry the same channel values, like pack_weights_fl) and the
    per-element lerp selects among the four frames by ``irel``.

    Select + lerp run in f32 regardless of ``out_dtype``: under bf16
    Mosaic cannot relayout the irel-compare i1 mask from its native
    (8, 128) tiling to the (16, 128) tiling bf16 selects want
    ("Invalid relayout ... vector<128x128xi1>"), and the f32 lerp of a
    bf16-rounded film is at least as accurate. In f32 the trailing
    cast is a no-op, keeping the chain bit-exactness (tested)."""
    frames = tuple(
        win[i : i + 1, :].astype(jnp.float32) for i in range(4)
    )
    planes = []
    for a in range(4):
        tiled = [
            jnp.concatenate([f[:, a * C : (a + 1) * C]] * 2, axis=1)
            for f in frames
        ]
        left = jnp.where(
            irel == 0, tiled[0], jnp.where(irel == 1, tiled[1], tiled[2])
        )
        right = jnp.where(
            irel == 0, tiled[1], jnp.where(irel == 1, tiled[2], tiled[3])
        )
        planes.append(
            (left * (1.0 - w32) + right * w32).astype(out_dtype)
        )
    return tuple(planes)


def _fold_dfilm_cr(dplanes, irel, w32):
    """Audio-rate film cotangent planes -> (4, 4C) per-tile window
    gradient (the upsample's segment-sum transpose, done in-tile;
    window row p accumulates every sample whose lerp touches padded
    frame 2j+p). f32 accumulation for the same reason as _bwd_core's
    rsum."""
    rows = [[], [], [], []]  # per padded-window row p: per-param (1, C)
    for a in range(4):
        d32 = dplanes[a].astype(jnp.float32)
        dl = d32 * (1.0 - w32)
        dr = d32 * w32
        for p in range(4):
            contrib = jnp.zeros_like(d32)
            if p <= 2:
                contrib += jnp.where(irel == p, dl, 0.0)
            if p >= 1:
                contrib += jnp.where(irel == p - 1, dr, 0.0)
            s = jnp.sum(contrib, axis=0, keepdims=True)  # (1, 2C)
            rows[p].append(s[:, :C] + s[:, C:])  # fold lane halves
    r = [jnp.concatenate(rows[p], axis=1) for p in range(4)]  # (1, 4C)
    return jnp.concatenate(r, axis=0)


def _fwd_kernel_cr(
    hop, tpb,
    exc_ref, win_ref, scale_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    w3_ref, b3_ref, w4_ref, b4_ref, out_ref,
):
    from jax.experimental import pallas as pl

    is_first = pl.program_id(0) % tpb == 0
    irel, _, w32 = _interp_w_cr(hop, is_first, exc_ref.dtype)
    gi, bi, gn, bn = _film_planes_cr(win_ref[0], irel, w32, exc_ref.dtype)
    out, _ = _forward_core(
        exc_ref[:], gi, bi, gn, bn, scale_ref[:], w1_ref[:], b1_ref[:],
        w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:], w4_ref[:], b4_ref[:],
    )
    out_ref[:] = out


def _bwd_kernel_cr(
    hop, tpb,
    exc_ref, win_ref, dy_ref, scale_ref, w1_ref, b1_ref, w2_ref,
    b2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
    dexc_ref, dwin_ref, dscale_ref, dw1_ref, db1_ref, dw2_ref,
    db2_ref, dw3_ref, db3_ref, dw4_ref, db4_ref,
):
    from jax.experimental import pallas as pl

    is_first = pl.program_id(0) % tpb == 0
    irel, _, w32 = _interp_w_cr(hop, is_first, exc_ref.dtype)
    film_planes = _film_planes_cr(win_ref[0], irel, w32, exc_ref.dtype)
    dexc, dplanes, wgrads = _bwd_core(
        exc_ref[:], film_planes, dy_ref[:], scale_ref[:],
        w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:],
        w4_ref[:], b4_ref[:],
    )
    dexc_ref[:] = dexc
    dwin_ref[0] = _fold_dfilm_cr(dplanes, irel, w32)
    _accumulate_wgrads(
        wgrads,
        (dscale_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
         dw4_ref, db4_ref),
    )


def supports_cr(shaper_cfg, n_audio: int, n_control: int) -> bool:
    """True when the control-rate fused kernel applies: shipped
    architecture, integer hop with 8 | hop <= 256, even control length
    (tile = 2 hops must divide the clip).

    The hop bounds are Mosaic-lowering gates, not math gates (the
    kernel itself is hop-generic and interpret-mode tests cover e.g.
    hop=10): the CR row blocks are (hop, 2C), and per this module's
    documented block constraint the sublane dim must be divisible by 8
    to lower on a real TPU; and the backward pins its tile to 2*hop
    rows with per-tile window + weight-grad blocks resident, so hops
    beyond 256 risk overflowing the ~16 MB scoped-VMEM budget the
    audio-rate backward caps at 128 rows for. Ungated geometries fall
    back to the audio-rate kernel / XLA chain in NEWT.apply."""
    if not supports(shaper_cfg):
        return False
    if n_control < 2 or n_control % 2 or n_audio % n_control:
        return False
    hop = n_audio // n_control
    return hop >= 8 and hop % 8 == 0 and hop <= 256


def _pad_film_cr(film_c: jnp.ndarray) -> jnp.ndarray:
    """(B, Tc, 4C) -> (B, Tc+2, 4C) with one replicated edge frame per
    side (padded row p holds frame p-1; clamping becomes lerp between
    equal frames, which is exact)."""
    return jnp.concatenate([film_c[:, :1], film_c, film_c[:, -1:]], axis=1)


def _windows_cr(film_c: jnp.ndarray) -> jnp.ndarray:
    """(B, Tc, 4C) -> (B*(Tc//2), 4, 4C): tile j's padded-frame window
    [2j, 2j+4), built with four strided slices of the padded film — no
    gathers, and control-rate-sized (16 MB at canonical shape vs the
    524 MB audio-rate film this kernel exists to avoid)."""
    b, tc, cc = film_c.shape
    tpb = tc // 2
    fp = _pad_film_cr(film_c)
    win = jnp.stack(
        [fp[:, k : k + 2 * tpb - 1 : 2] for k in range(4)], axis=2
    )  # (B, tpb, 4, 4C)
    return win.reshape(b * tpb, 4, cc)


def _unwindow_dfilm(dwin: jnp.ndarray, b: int, tc: int) -> jnp.ndarray:
    """Transpose of :func:`_windows_cr`: (B*(Tc//2), 4, 4C) per-tile
    window gradients -> (B, Tc, 4C) control-frame gradient. Window row
    k of tile j contributed to padded frame 2j+k, so rows {0,1} tile
    padded frames [0, Tc) and rows {2,3} tile [2, Tc+2); the overlap
    sums, and the edge-replica rows fold onto frames 0 and Tc-1 (the
    transpose of the replicate-pad)."""
    cc = dwin.shape[-1]
    tpb = tc // 2
    d4 = dwin.reshape(b, tpb, 4, cc)
    da = d4[:, :, :2].reshape(b, tc, cc)  # padded rows [0, Tc)
    db = d4[:, :, 2:].reshape(b, tc, cc)  # padded rows [2, Tc+2)
    mid = da[:, 2:] + db[:, : tc - 2]  # padded rows [2, Tc)
    first = da[:, 0] + da[:, 1]  # padded rows 0 (replica of frame 0) + 1
    last = db[:, tc - 2] + db[:, tc - 1]  # padded rows Tc, Tc+1 (replica)
    return jnp.concatenate([first[:, None], mid, last[:, None]], axis=1)


def _cr_specs(hop):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    row_spec = lambda width: pl.BlockSpec(
        (hop, width), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    win_spec = pl.BlockSpec(
        (1, 4, 4 * C), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    w_spec = lambda shape: pl.BlockSpec(
        shape, lambda g: (0, 0), memory_space=pltpu.VMEM
    )
    return row_spec, win_spec, w_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def film_shaper_fused_cr(
    exciter: jnp.ndarray,
    film_c: jnp.ndarray,
    weights_fl: Tuple[jnp.ndarray, ...],
    hop: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """film_shaper_fused_fl with the control->audio FiLM upsample
    folded in: (B, Ta, C) exciter + (B, Tc, 4C) CONTROL-rate film +
    pack_weights_fl weights -> (B, Ta, C), Ta = Tc*hop.

    Use :func:`supports_cr` to gate. The in-kernel interpolation
    reproduces ``linear_upsample``'s weight arithmetic bit-exactly
    (tests/test_newt_fused.py test_cr_film_interpolation_bit_exact);
    whole-kernel output differs from the audio-rate kernel only by
    cross-program FMA contraction of the lerp (≤1 ulp film, ~1e-6
    after the sine chain)."""
    from jax.experimental import pallas as pl

    b, ta, c = exciter.shape
    tc = film_c.shape[1]
    assert c == C and ta == tc * hop and tc % 2 == 0
    tpb = tc // 2
    row_spec, win_spec, w_spec = _cr_specs(hop)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_cr, hop, tpb),
        grid=(b * tpb,),
        in_specs=[row_spec(2 * C), win_spec]
        + [w_spec(s) for s in _w_shapes(2 * C)],
        out_specs=row_spec(2 * C),
        out_shape=jax.ShapeDtypeStruct((b * ta // 2, 2 * C), exciter.dtype),
        interpret=_interpret_here(interpret),
    )(exciter.reshape(b * ta // 2, 2 * C), _windows_cr(film_c), *weights_fl)
    return out.reshape(b, ta, c)


def _fused_fwd_cr(exciter, film_c, weights_fl, hop, interpret):
    return (
        film_shaper_fused_cr(exciter, film_c, weights_fl, hop, interpret),
        (exciter, film_c, weights_fl),
    )


def _fused_bwd_cr(hop, interpret, residuals, dy):
    from jax.experimental import pallas as pl

    exciter, film_c, weights_fl = residuals
    b, ta, c = exciter.shape
    tc = film_c.shape[1]
    tpb = tc // 2
    row_spec, win_spec, w_spec = _cr_specs(hop)
    w_shapes = _w_shapes(2 * C)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_cr, hop, tpb),
        grid=(b * tpb,),
        in_specs=[row_spec(2 * C), win_spec, row_spec(2 * C)]
        + [w_spec(s) for s in w_shapes],
        out_specs=[row_spec(2 * C), win_spec]
        + [w_spec(s) for s in w_shapes],
        out_shape=[
            jax.ShapeDtypeStruct((b * ta // 2, 2 * C), exciter.dtype),
            # per-tile window gradients; each block is written by
            # exactly one grid step, and _unwindow_dfilm segment-sums
            # them back to control frames outside the kernel
            jax.ShapeDtypeStruct((b * tpb, 4, 4 * C), jnp.float32),
        ]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes],
        interpret=_interpret_here(interpret),
    )(
        exciter.reshape(b * ta // 2, 2 * C),
        _windows_cr(film_c),
        dy.reshape(b * ta // 2, 2 * C),
        *weights_fl,
    )
    dexc = outs[0].reshape(b, ta, c)
    dfilm_c = _unwindow_dfilm(outs[1], b, tc).astype(film_c.dtype)
    return dexc, dfilm_c, tuple(o.astype(exciter.dtype) for o in outs[2:])


film_shaper_fused_cr.defvjp(_fused_fwd_cr, _fused_bwd_cr)


# ---------------------------------------------------------------------------
# streaming variant: segment-ramp interpolation, forward-only
# ---------------------------------------------------------------------------
# The live-serving path (streaming/synth.py step 5) has DIFFERENT
# interpolation semantics from the offline graph: within a buffer the
# FiLM parameters ramp linearly from the PREVIOUS control frame to each
# new frame over one hop (_segment_interp — continuous across buffers
# by construction), not the offline align_corners=False grid. At 256
# concurrent streams the chain materializes a (256, 1024, 256) f32
# audio-rate film (268 MB) per buffer and the sine chain's
# intermediates besides; this kernel folds the ramp in-register the
# same way the CR kernel folds the offline upsample. Forward-only (a
# live stream never differentiates), so no custom VJP.
def _interp_w_stream(hop):
    """Per-element segment-ramp state for one 2-hop tile: irel in
    {0,1} is the segment index (selects window rows irel/irel+1), w is
    ``(o+1)/hop`` — the same division as _segment_interp's
    ``(arange(hop)+1)/hop`` ramp."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (hop, 2 * C), 0)
    half = (jax.lax.broadcasted_iota(jnp.int32, (hop, 2 * C), 1) >= C)
    u = 2 * rows + half.astype(jnp.int32)  # audio sample within tile
    seg = (u >= hop).astype(jnp.int32)  # segment within tile {0, 1}
    w32 = (u - seg * hop + 1).astype(jnp.float32) / jnp.float32(hop)
    return seg, w32


def _film_planes_stream(win, irel, w32, out_dtype):
    """(4, 4C) window (rows = frames [prev..][2j : 2j+3), row 3 unused)
    -> 4 full-lane (hop, 2C) film planes via the segment ramp.

    The lerp is _segment_interp's ``start + (end - start) * t`` form
    (NOT the offline kernels' ``left*(1-w)+right*w``) so the f32 values
    match the chain up to cross-program FMA contraction. f32 select +
    ramp for the same Mosaic mask-relayout reason as _film_planes_cr."""
    frames = tuple(
        win[i : i + 1, :].astype(jnp.float32) for i in range(3)
    )
    planes = []
    for a in range(4):
        tiled = [
            jnp.concatenate([f[:, a * C : (a + 1) * C]] * 2, axis=1)
            for f in frames
        ]
        start = jnp.where(irel == 0, tiled[0], tiled[1])
        end = jnp.where(irel == 0, tiled[1], tiled[2])
        planes.append((start + (end - start) * w32).astype(out_dtype))
    return tuple(planes)


def _fwd_kernel_stream(
    hop,
    exc_ref, win_ref, scale_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    w3_ref, b3_ref, w4_ref, b4_ref, out_ref,
):
    irel, w32 = _interp_w_stream(hop)
    gi, bi, gn, bn = _film_planes_stream(
        win_ref[0], irel, w32, exc_ref.dtype
    )
    out, _ = _forward_core(
        exc_ref[:], gi, bi, gn, bn, scale_ref[:], w1_ref[:], b1_ref[:],
        w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:], w4_ref[:], b4_ref[:],
    )
    out_ref[:] = out


def supports_stream(shaper_cfg, n_audio: int, n_control: int) -> bool:
    """Same geometry gates as the CR kernel (tile = 2 control hops)."""
    return supports_cr(shaper_cfg, n_audio, n_control)


def _windows_stream(prev_film: jnp.ndarray, film_c: jnp.ndarray) -> jnp.ndarray:
    """(B, 4C) carried frame + (B, K, 4C) buffer frames ->
    (B*(K//2), 4, 4C) per-tile windows: tile j's segment s ramps from
    prepended frame 2j+s to 2j+s+1, so it needs prepended rows
    [2j, 2j+3) (row 3 is slack for the (1, 4, 4C) block shape; one
    replicated tail frame pads the strided slices into range)."""
    b, k, cc = film_c.shape
    tpb = k // 2
    fp = jnp.concatenate(
        [prev_film[:, None], film_c, film_c[:, -1:]], axis=1
    )  # (B, K+2, 4C)
    win = jnp.stack(
        [fp[:, i : i + 2 * tpb - 1 : 2] for i in range(4)], axis=2
    )  # (B, tpb, 4, 4C)
    return win.reshape(b * tpb, 4, cc)


# ---------------------------------------------------------------------------
# exciter-fused variant: the harmonic bank + 101->64 mixer computed
# in-kernel — the (B, Ta, H) sinusoid bank and the (B, Ta, C) exciter
# never exist in HBM
# ---------------------------------------------------------------------------
# The CR kernel above still READS its exciter from HBM, and XLA
# produces that exciter by materializing the (B, Ta, 101) harmonic
# bank (207 MB f32 at canonical train shape), reading it back into the
# 101->64 mixer matmul, and writing the (B, Ta, 64) exciter (131 MB)
# the kernel then reads again — plus, in training, the mixer's weight
# gradient re-reads the saved bank and the kernel's 131 MB exciter
# cotangent round-trips through HBM to reach it (~1 GB of traffic
# whose information content is the (B, Ta) phase/f0 tracks, 4 MB).
#
# This variant reads ONLY the wrapped phase and f0 (packed (R, 4),
# see pack_pf) and rebuilds the exciter per tile in VMEM: harmonics
# ride the 128 lanes (101 padded with zero mixer rows), the two bank
# tiles (even/odd sample rows of the full-lane layout) are
# `_psin`-evaluated with the same polynomial + wrapped-phase formula
# as ops/oscillator.bank_from_phase, and the 101->64 mix is an MXU
# `dot_general` per half. The backward recomputes the bank and
# accumulates the mixer weight gradient in f32 across the grid like
# the shaper weight grads; no exciter cotangent is ever written.
# Reference chain being fused: generators.py:58-66 (bank) +
# neural_waveshaping.py:66 (mixer) + shaping.py:67-79 (NEWT chain).
#
# MEASURED OUTCOME (v5e, 2026-08-20): the traffic argument loses to
# the transcendental argument — the bank is 101 sines/sample and
# Mosaic's polynomial sine is slower than XLA's vectorized bank
# (platform rule 8), so both spellings REGRESS end-to-end: batch-1
# headline 3060x (chain) vs 2881x (xcr) vs 2808x (xfull); batch-8 f32
# train step 30.9 -> 31.7 ms (scripts/ab_fused_exciter.py). Kept as a
# correct, tested A/B record (NeuralWaveshaping.fuse_exciter /
# fuse_out_mixer, both default False) — the same fate as FastNEWT's
# table lookup (models/newt.py).
_KF = 128  # lane-padded harmonic count


def pack_pf(phase: jnp.ndarray, f0_up: jnp.ndarray) -> jnp.ndarray:
    """(B, Ta) wrapped phase + (B, Ta) audio-rate f0 -> (B*Ta/2, 4)
    rows [phase_even, phase_odd, f0_even, f0_odd] aligned with the
    full-lane (R/2, 2C) activation layout (row r = samples 2r, 2r+1).

    Phase must be ALREADY wrapped mod tau (oscillator.py wraps before
    the harmonic expansion; the in-kernel expansion multiplies by k
    exactly like bank_from_phase). Always float32 — phase precision is
    load-bearing (CLAUDE.md layout invariants), whatever the compute
    dtype."""
    b, ta = phase.shape
    ph2 = phase.astype(jnp.float32).reshape(b * ta // 2, 2)
    f2 = f0_up.astype(jnp.float32).reshape(b * ta // 2, 2)
    return jnp.concatenate([ph2, f2], axis=1)


def pack_mixer(mixer_p: Dict, dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Harmonic-mixer dense params {'w': (H, C), 'b': (C,)} ->
    (w_pad (128, C), b_fl (1, 2C)). Zero rows pad H -> 128 so the
    masked bank lanes >= H contract to exactly 0; the bias is
    lane-tiled like pack_weights_fl. Differentiable (pad/concat), so
    calling it inside the traced forward lets AD route the kernel's
    packed-layout cotangents back to the {'w','b'} pytree."""
    w, bvec = mixer_p["w"], mixer_p["b"]
    if dtype is not None:
        w, bvec = w.astype(dtype), bvec.astype(dtype)
    w_pad = jnp.pad(w, ((0, _KF - w.shape[0]), (0, 0)))
    b_fl = jnp.concatenate([bvec, bvec])[None, :]
    return w_pad, b_fl


def pack_offsets(phase_offset, n_harmonics: int) -> jnp.ndarray:
    """(H,) per-harmonic phase offsets (or None) -> (1, 128) f32 plane."""
    if phase_offset is None:
        off = jnp.zeros((n_harmonics,), jnp.float32)
    else:
        off = phase_offset.astype(jnp.float32)
    return jnp.pad(off, (0, _KF - n_harmonics))[None, :]


def _exciter_il(pf, off, mw, mb, n_harm, sr, out_dtype):
    """(hop, 4) phase/f0 rows -> ((hop, 2C) interleaved exciter,
    (be, bo) bank tiles for the backward's mixer-grad matmuls).

    All bank math runs f32 (phase precision; _psin is f32-internal
    anyway); the mix accumulates f32 on the MXU and casts once at the
    end — same accumulate-wide/round-once contract as dense_apply."""
    hop = pf.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (hop, _KF), 1)
    kf = (lane + 1).astype(jnp.float32)  # harmonic number k
    off32 = off.astype(jnp.float32)  # (1, 128), broadcasts over rows
    nyq = jnp.float32(sr / 2.0)

    def bank(ph_col, f0_col):
        ph = jnp.broadcast_to(ph_col.astype(jnp.float32), (hop, _KF))
        f0 = jnp.broadcast_to(f0_col.astype(jnp.float32), (hop, _KF))
        mask = (f0 * kf < nyq) & (lane < n_harm)
        return _psin(ph * kf + off32) * mask.astype(jnp.float32)

    be = bank(pf[:, 0:1], pf[:, 2:3])
    bo = bank(pf[:, 1:2], pf[:, 3:4])
    mw32 = mw.astype(jnp.float32)
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    exc = jnp.concatenate([dot(be, mw32), dot(bo, mw32)], axis=1)
    exc = exc + mb.astype(jnp.float32)
    return exc.astype(out_dtype), (be, bo)


def _fwd_kernel_xcr(
    hop, tpb, n_harm, sr,
    pf_ref, off_ref, win_ref, mw_ref, mb_ref, scale_ref, w1_ref, b1_ref,
    w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref, out_ref,
):
    from jax.experimental import pallas as pl

    out_dtype = mw_ref.dtype
    exc, _ = _exciter_il(
        pf_ref[:], off_ref[:], mw_ref[:], mb_ref[:], n_harm, sr, out_dtype
    )
    is_first = pl.program_id(0) % tpb == 0
    irel, _, w32 = _interp_w_cr(hop, is_first, out_dtype)
    gi, bi, gn, bn = _film_planes_cr(win_ref[0], irel, w32, out_dtype)
    out, _ = _forward_core(
        exc, gi, bi, gn, bn, scale_ref[:], w1_ref[:], b1_ref[:],
        w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:], w4_ref[:], b4_ref[:],
    )
    out_ref[:] = out


def _bwd_kernel_xcr(
    hop, tpb, n_harm, sr,
    pf_ref, off_ref, win_ref, mw_ref, mb_ref, dy_ref, scale_ref, w1_ref,
    b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
    dwin_ref, dmwe_ref, dmwo_ref, dmb_ref, dscale_ref, dw1_ref, db1_ref,
    dw2_ref, db2_ref, dw3_ref, db3_ref, dw4_ref, db4_ref,
):
    from jax.experimental import pallas as pl

    out_dtype = mw_ref.dtype
    exc, (be, bo) = _exciter_il(
        pf_ref[:], off_ref[:], mw_ref[:], mb_ref[:], n_harm, sr, out_dtype
    )
    is_first = pl.program_id(0) % tpb == 0
    irel, _, w32 = _interp_w_cr(hop, is_first, out_dtype)
    film_planes = _film_planes_cr(win_ref[0], irel, w32, out_dtype)
    dexc, dplanes, wgrads = _bwd_core(
        exc, film_planes, dy_ref[:], scale_ref[:],
        w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:],
        w4_ref[:], b4_ref[:],
    )
    dwin_ref[0] = _fold_dfilm_cr(dplanes, irel, w32)
    # mixer grads: dW[k, c] = sum_t bank[t, k] * dexc[t, c], per sample
    # half; accumulated as two (128, 2C) grid-sums whose relevant lane
    # halves are folded outside the kernel (avoids in-kernel lane
    # slicing). f32 accumulation, same reason as _bwd_core's rsum.
    dexc32 = dexc.astype(jnp.float32)
    tdot = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dmwe_ref[:] = jnp.zeros_like(dmwe_ref)
        dmwo_ref[:] = jnp.zeros_like(dmwo_ref)
        dmb_ref[:] = jnp.zeros_like(dmb_ref)

    dmwe_ref[:] += tdot(be, dexc32)
    dmwo_ref[:] += tdot(bo, dexc32)
    dmb_ref[:] += jnp.sum(dexc32, axis=0, keepdims=True)
    _accumulate_wgrads(
        wgrads,
        (dscale_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
         dw4_ref, db4_ref),
    )


def supports_xcr(
    shaper_cfg, n_audio: int, n_control: int, n_harmonics: int
) -> bool:
    """CR-kernel geometry gates plus the lane-padded harmonic bound."""
    return supports_cr(shaper_cfg, n_audio, n_control) and (
        2 <= n_harmonics <= _KF
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def bank_film_shaper_fused_xcr(
    phase: jnp.ndarray,
    f0_up: jnp.ndarray,
    offsets: jnp.ndarray,
    film_c: jnp.ndarray,
    mixer_pl: Tuple[jnp.ndarray, jnp.ndarray],
    weights_fl: Tuple[jnp.ndarray, ...],
    n_harmonics: int,
    sample_rate: float,
    hop: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Harmonic bank + mixer + FiLM upsample + shaper chain, fused:
    (B, Ta) WRAPPED phase + (B, Ta) f0 + (1, 128) pack_offsets plane +
    (B, Tc, 4C) control-rate film + pack_mixer planes +
    pack_weights_fl weights -> (B, Ta, C) shaped signal (pre-NEWT-mixer).

    Gate with :func:`supports_xcr`. Forward matches
    bank_from_phase -> dense_apply -> film_shaper_fused_cr up to MXU
    contraction order of the zero-padded mix (tests/test_newt_fused.py
    test_xcr_*). Phase and f0 receive zero cotangents (they are data,
    not parameters; jax DCEs the zeros in training)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, ta = phase.shape
    tc = film_c.shape[1]
    assert ta == tc * hop and tc % 2 == 0
    tpb = tc // 2
    row_spec, win_spec, w_spec = _cr_specs(hop)
    pf_spec = pl.BlockSpec(
        (hop, 4), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_xcr, hop, tpb, n_harmonics,
                          sample_rate),
        grid=(b * tpb,),
        in_specs=[pf_spec, w_spec((1, _KF)), win_spec, w_spec((_KF, C)),
                  w_spec((1, 2 * C))]
        + [w_spec(s) for s in _w_shapes(2 * C)],
        out_specs=row_spec(2 * C),
        out_shape=jax.ShapeDtypeStruct(
            (b * ta // 2, 2 * C), mixer_pl[0].dtype
        ),
        interpret=_interpret_here(interpret),
    )(
        pack_pf(phase, f0_up), offsets, _windows_cr(film_c), *mixer_pl,
        *weights_fl,
    )
    return out.reshape(b, ta, C)


def _fused_fwd_xcr(
    phase, f0_up, offsets, film_c, mixer_pl, weights_fl,
    n_harmonics, sample_rate, hop, interpret,
):
    out = bank_film_shaper_fused_xcr(
        phase, f0_up, offsets, film_c, mixer_pl, weights_fl,
        n_harmonics, sample_rate, hop, interpret,
    )
    return out, (phase, f0_up, offsets, film_c, mixer_pl, weights_fl)


def _fused_bwd_xcr(n_harmonics, sample_rate, hop, interpret, residuals, dy):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    phase, f0_up, offsets, film_c, mixer_pl, weights_fl = residuals
    b, ta = phase.shape
    tc = film_c.shape[1]
    tpb = tc // 2
    row_spec, win_spec, w_spec = _cr_specs(hop)
    pf_spec = pl.BlockSpec(
        (hop, 4), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    w_shapes = _w_shapes(2 * C)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_xcr, hop, tpb, n_harmonics,
                          sample_rate),
        grid=(b * tpb,),
        in_specs=[pf_spec, w_spec((1, _KF)), win_spec, w_spec((_KF, C)),
                  w_spec((1, 2 * C)), row_spec(2 * C)]
        + [w_spec(s) for s in w_shapes],
        out_specs=[win_spec, w_spec((_KF, 2 * C)), w_spec((_KF, 2 * C)),
                   w_spec((1, 2 * C))]
        + [w_spec(s) for s in w_shapes],
        out_shape=[
            jax.ShapeDtypeStruct((b * tpb, 4, 4 * C), jnp.float32),
            jax.ShapeDtypeStruct((_KF, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((_KF, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * C), jnp.float32),
        ]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes],
        interpret=_interpret_here(interpret),
    )(
        pack_pf(phase, f0_up), offsets, _windows_cr(film_c), *mixer_pl,
        dy.reshape(b * ta // 2, 2 * C),
        *weights_fl,
    )
    dwin, dmwe, dmwo, dmb = outs[0], outs[1], outs[2], outs[3]
    dfilm_c = _unwindow_dfilm(dwin, b, tc).astype(film_c.dtype)
    mw_dtype = mixer_pl[0].dtype
    # fold the (128, 2C) half-accumulators back to the packed layout:
    # even-sample banks contracted against even-half cotangent lanes,
    # odd against odd
    dmw = (dmwe[:, :C] + dmwo[:, C:]).astype(mw_dtype)
    # pack_mixer's b_fl = concat([b, b]), so AD folds the returned
    # halves by summation: handing back dmb verbatim yields
    # d_b = dmb[:C] + dmb[C:] — the even+odd sample-half sum, exactly
    # the bias gradient.
    dmb_fl = dmb.astype(mw_dtype)
    dweights = tuple(o.astype(mw_dtype) for o in outs[4:])
    return (
        jnp.zeros_like(phase),
        jnp.zeros_like(f0_up),
        jnp.zeros_like(offsets),
        dfilm_c,
        (dmw, dmb_fl),
        dweights,
    )


bank_film_shaper_fused_xcr.defvjp(_fused_fwd_xcr, _fused_bwd_xcr)


# ---------------------------------------------------------------------------
# whole-synth variant: xcr + the NEWT 64->1 output mixer folded in —
# phase/f0 and control-rate film in, AUDIO out; no audio-rate
# (B, Ta, C)-wide array touches HBM in either direction
# ---------------------------------------------------------------------------
# On top of xcr this removes the kernel's (B, Ta, C) output write, the
# XLA mixer's read of it, and — in training — the (B, Ta, C) cotangent
# the XLA mixer backward would otherwise materialize for the kernel to
# read back (~525 MB round trip at canonical train shape). The 64->1
# mix is a weighted lane reduction per sample half (VPU, no MXU); its
# weight gradient accumulates across the grid like the shaper weight
# grads. The mixer BIAS stays outside the kernel (a scalar add on the
# (B, Ta) output — XLA fuses it, and its gradient falls out of AD).
def pack_out_mixer(mixer_p: Dict, dtype=None) -> jnp.ndarray:
    """NEWT output-mixer dense params {'w': (C, 1), 'b': (1,)} ->
    lane-tiled (1, 2C) weight row (bias handled outside the kernel).
    Differentiable, so AD folds the kernel's (1, 2C) weight cotangent
    back to (C, 1) by summing the lane halves."""
    w = mixer_p["w"][:, 0]
    if dtype is not None:
        w = w.astype(dtype)
    return jnp.concatenate([w, w])[None, :]


def _out_mix(pre, mv_fl, half):
    """(hop, 2C) pre-mix signal -> (hop, 2) per-sample-half outputs."""
    sum_e = jnp.sum(
        jnp.where(half, 0.0, pre.astype(jnp.float32) * mv_fl),
        axis=1, keepdims=True,
    )
    sum_o = jnp.sum(
        jnp.where(half, pre.astype(jnp.float32) * mv_fl, 0.0),
        axis=1, keepdims=True,
    )
    return jnp.concatenate([sum_e, sum_o], axis=1)


def _fwd_kernel_xfull(
    hop, tpb, n_harm, sr,
    pf_ref, off_ref, win_ref, mw_ref, mb_ref, mv_ref, scale_ref, w1_ref,
    b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref, out_ref,
):
    from jax.experimental import pallas as pl

    cdtype = mw_ref.dtype
    exc, _ = _exciter_il(
        pf_ref[:], off_ref[:], mw_ref[:], mb_ref[:], n_harm, sr, cdtype
    )
    is_first = pl.program_id(0) % tpb == 0
    irel, _, w32 = _interp_w_cr(hop, is_first, cdtype)
    gi, bi, gn, bn = _film_planes_cr(win_ref[0], irel, w32, cdtype)
    pre, _ = _forward_core(
        exc, gi, bi, gn, bn, scale_ref[:], w1_ref[:], b1_ref[:],
        w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:], w4_ref[:], b4_ref[:],
    )
    half = jax.lax.broadcasted_iota(jnp.int32, (hop, 2 * C), 1) >= C
    out_ref[:] = _out_mix(pre, mv_ref[:].astype(jnp.float32), half).astype(
        out_ref.dtype
    )


def _bwd_kernel_xfull(
    hop, tpb, n_harm, sr,
    pf_ref, off_ref, win_ref, mw_ref, mb_ref, mv_ref, dy_ref, scale_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
    dwin_ref, dmwe_ref, dmwo_ref, dmb_ref, dmv_ref, dscale_ref, dw1_ref,
    db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref, dw4_ref, db4_ref,
):
    from jax.experimental import pallas as pl

    cdtype = mw_ref.dtype
    exc, (be, bo) = _exciter_il(
        pf_ref[:], off_ref[:], mw_ref[:], mb_ref[:], n_harm, sr, cdtype
    )
    is_first = pl.program_id(0) % tpb == 0
    irel, _, w32 = _interp_w_cr(hop, is_first, cdtype)
    film_planes = _film_planes_cr(win_ref[0], irel, w32, cdtype)
    # recompute the pre-mix forward for the out-mixer weight grad
    pre, _ = _forward_core(
        exc, *film_planes, scale_ref[:], w1_ref[:], b1_ref[:],
        w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:], w4_ref[:], b4_ref[:],
    )
    half = jax.lax.broadcasted_iota(jnp.int32, (hop, 2 * C), 1) >= C
    dy32 = dy_ref[:].astype(jnp.float32)  # (hop, 2)
    dy_e = jnp.broadcast_to(dy32[:, 0:1], (hop, 2 * C))
    dy_o = jnp.broadcast_to(dy32[:, 1:2], (hop, 2 * C))
    dyb = jnp.where(half, dy_o, dy_e)  # per-element output cotangent
    mv32 = mv_ref[:].astype(jnp.float32)
    dpre = (dyb * mv32).astype(cdtype)  # d(pre-mix signal)
    dexc, dplanes, wgrads = _bwd_core(
        exc, film_planes, dpre, scale_ref[:],
        w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:],
        w4_ref[:], b4_ref[:],
    )
    dwin_ref[0] = _fold_dfilm_cr(dplanes, irel, w32)
    dexc32 = dexc.astype(jnp.float32)
    tdot = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dmwe_ref[:] = jnp.zeros_like(dmwe_ref)
        dmwo_ref[:] = jnp.zeros_like(dmwo_ref)
        dmb_ref[:] = jnp.zeros_like(dmb_ref)
        dmv_ref[:] = jnp.zeros_like(dmv_ref)

    dmwe_ref[:] += tdot(be, dexc32)
    dmwo_ref[:] += tdot(bo, dexc32)
    dmb_ref[:] += jnp.sum(dexc32, axis=0, keepdims=True)
    dmv_ref[:] += jnp.sum(
        pre.astype(jnp.float32) * dyb, axis=0, keepdims=True
    )
    _accumulate_wgrads(
        wgrads,
        (dscale_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
         dw4_ref, db4_ref),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def bank_newt_fused_xfull(
    phase: jnp.ndarray,
    f0_up: jnp.ndarray,
    offsets: jnp.ndarray,
    film_c: jnp.ndarray,
    mixer_pl: Tuple[jnp.ndarray, jnp.ndarray],
    out_mixer_fl: jnp.ndarray,
    weights_fl: Tuple[jnp.ndarray, ...],
    n_harmonics: int,
    sample_rate: float,
    hop: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """The whole NEWT synthesis hot path in one kernel: (B, Ta) wrapped
    phase + f0 + (B, Tc, 4C) control-rate film -> (B, Ta) pre-bias
    audio (add the output-mixer bias outside). Combines
    bank_film_shaper_fused_xcr with the 64->1 output mix as a weighted
    lane reduction; gate with :func:`supports_xcr` (plus
    out_channels == 1 at the caller)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, ta = phase.shape
    tc = film_c.shape[1]
    assert ta == tc * hop and tc % 2 == 0
    tpb = tc // 2
    row_spec, win_spec, w_spec = _cr_specs(hop)
    pf_spec = pl.BlockSpec(
        (hop, 4), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (hop, 2), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_xfull, hop, tpb, n_harmonics,
                          sample_rate),
        grid=(b * tpb,),
        in_specs=[pf_spec, w_spec((1, _KF)), win_spec, w_spec((_KF, C)),
                  w_spec((1, 2 * C)), w_spec((1, 2 * C))]
        + [w_spec(s) for s in _w_shapes(2 * C)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b * ta // 2, 2), mixer_pl[0].dtype
        ),
        interpret=_interpret_here(interpret),
    )(
        pack_pf(phase, f0_up), offsets, _windows_cr(film_c), *mixer_pl,
        out_mixer_fl, *weights_fl,
    )
    return out.reshape(b, ta)


def _fused_fwd_xfull(
    phase, f0_up, offsets, film_c, mixer_pl, out_mixer_fl, weights_fl,
    n_harmonics, sample_rate, hop, interpret,
):
    out = bank_newt_fused_xfull(
        phase, f0_up, offsets, film_c, mixer_pl, out_mixer_fl, weights_fl,
        n_harmonics, sample_rate, hop, interpret,
    )
    return out, (phase, f0_up, offsets, film_c, mixer_pl, out_mixer_fl,
                 weights_fl)


def _fused_bwd_xfull(
    n_harmonics, sample_rate, hop, interpret, residuals, dy
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (phase, f0_up, offsets, film_c, mixer_pl, out_mixer_fl,
     weights_fl) = residuals
    b, ta = phase.shape
    tc = film_c.shape[1]
    tpb = tc // 2
    row_spec, win_spec, w_spec = _cr_specs(hop)
    pf_spec = pl.BlockSpec(
        (hop, 4), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    dy_spec = pl.BlockSpec(
        (hop, 2), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    w_shapes = _w_shapes(2 * C)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_xfull, hop, tpb, n_harmonics,
                          sample_rate),
        grid=(b * tpb,),
        in_specs=[pf_spec, w_spec((1, _KF)), win_spec, w_spec((_KF, C)),
                  w_spec((1, 2 * C)), w_spec((1, 2 * C)), dy_spec]
        + [w_spec(s) for s in w_shapes],
        out_specs=[win_spec, w_spec((_KF, 2 * C)), w_spec((_KF, 2 * C)),
                   w_spec((1, 2 * C)), w_spec((1, 2 * C))]
        + [w_spec(s) for s in w_shapes],
        out_shape=[
            jax.ShapeDtypeStruct((b * tpb, 4, 4 * C), jnp.float32),
            jax.ShapeDtypeStruct((_KF, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((_KF, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * C), jnp.float32),
        ]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes],
        interpret=_interpret_here(interpret),
    )(
        pack_pf(phase, f0_up), offsets, _windows_cr(film_c), *mixer_pl,
        out_mixer_fl, dy.reshape(b * ta // 2, 2),
        *weights_fl,
    )
    dwin, dmwe, dmwo, dmb, dmv = outs[:5]
    dfilm_c = _unwindow_dfilm(dwin, b, tc).astype(film_c.dtype)
    mw_dtype = mixer_pl[0].dtype
    dmw = (dmwe[:, :C] + dmwo[:, C:]).astype(mw_dtype)
    dweights = tuple(o.astype(mw_dtype) for o in outs[5:])
    return (
        jnp.zeros_like(phase),
        jnp.zeros_like(f0_up),
        jnp.zeros_like(offsets),
        dfilm_c,
        (dmw, dmb.astype(mw_dtype)),
        dmv.astype(out_mixer_fl.dtype),
        dweights,
    )


bank_newt_fused_xfull.defvjp(_fused_fwd_xfull, _fused_bwd_xfull)


def film_shaper_fused_stream(
    exciter: jnp.ndarray,
    prev_film: jnp.ndarray,
    film_c: jnp.ndarray,
    weights_fl: Tuple[jnp.ndarray, ...],
    hop: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Streaming FiLM->shaper->FiLM: (B, Ta, C) exciter + (B, 4C)
    carried frame + (B, K, 4C) CONTROL-rate buffer frames ->
    (B, Ta, C), Ta = K*hop. Interpolation is streaming/synth.py
    _segment_interp's cross-buffer-continuous segment ramp, computed
    in-register (tests/test_newt_fused.py test_stream_kernel_*)."""
    from jax.experimental import pallas as pl

    b, ta, c = exciter.shape
    k = film_c.shape[1]
    assert c == C and ta == k * hop and k % 2 == 0
    tpb = k // 2
    row_spec, win_spec, w_spec = _cr_specs(hop)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_stream, hop),
        grid=(b * tpb,),
        in_specs=[row_spec(2 * C), win_spec]
        + [w_spec(s) for s in _w_shapes(2 * C)],
        out_specs=row_spec(2 * C),
        out_shape=jax.ShapeDtypeStruct((b * ta // 2, 2 * C), exciter.dtype),
        interpret=_interpret_here(interpret),
    )(
        exciter.reshape(b * ta // 2, 2 * C),
        _windows_stream(prev_film, film_c),
        *weights_fl,
    )
    return out.reshape(b, ta, c)
