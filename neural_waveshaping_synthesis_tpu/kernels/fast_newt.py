"""Fused FastNEWT table lookup as a Pallas TPU kernel.

The FastNEWT optimization (reference shaping.py:82-151) replaces the
64 learned scalar shapers with a 4096x64 lookup table. The natural XLA
expression — ``take_along_axis`` over the table axis with per-element
indices — lowers to a catastrophic gather on TPU (~90 ms for one 4-s
clip; the direct sine-MLP path takes microseconds).

This kernel keeps the whole table resident in VMEM and performs the
per-channel interpolated lookup tile-by-tile with on-chip dynamic
gathers, so the only HBM traffic is x in / y out.

Backend support note (v5e, jax 0.9 Mosaic): the in-kernel gather only
lowers when the index array has the operand's shape + (1,) — a per-lane
shuffle — so the (S, C)-table / (T, C)-index form does NOT compile on
TPU today (``has_pallas_support()`` probes and reports this). The
kernel runs in interpret mode and stands ready for a Mosaic gather
upgrade; on TPU the direct sine-MLP path remains the fast option
anyway (the reference's table-beats-MLP premise inverts on this
hardware).

Lookup arithmetic matches the reference exactly (S-scaling quirk
included): idx = S*(x-min)/(max-min); lower = clip(floor(idx), 0, S-1);
upper = min(lower+1, S-1); y = lerp(table[lower], table[upper], idx-lower).
"""
import functools

import jax
import jax.numpy as jnp

_HAS_SUPPORT = None


def has_pallas_support() -> bool:
    """Probe once whether this backend runs the kernel (interpret mode
    on CPU always works; some TPU runtimes may lack the in-kernel
    dynamic-gather lowering)."""
    global _HAS_SUPPORT
    if _HAS_SUPPORT is None:
        try:
            table = jnp.zeros((256, 64))
            x = jnp.zeros((1, 8, 64))
            fast_newt_lookup_pallas(table, x).block_until_ready()
            _HAS_SUPPORT = True
        except Exception:
            _HAS_SUPPORT = False
    return _HAS_SUPPORT


def _lookup_kernel(x_ref, table_ref, out_ref, *, table_min, table_max):
    from jax.experimental import pallas as pl  # noqa: F401

    s = table_ref.shape[0]
    x = x_ref[:]  # (TILE, C)
    idx = s * (x - table_min) / (table_max - table_min)
    lower = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, s - 1)
    upper = jnp.minimum(lower + 1, s - 1)
    fract = idx - lower.astype(x.dtype)
    table = table_ref[:]  # (S, C) resident in VMEM
    lower_v = jnp.take_along_axis(table, lower, axis=0)
    upper_v = jnp.take_along_axis(table, upper, axis=0)
    out_ref[:] = (upper_v - lower_v) * fract + lower_v


@functools.partial(
    jax.jit, static_argnames=("table_min", "table_max", "tile", "interpret")
)
def fast_newt_lookup_pallas(
    table: jnp.ndarray,
    x: jnp.ndarray,
    table_min: float = -3.0,
    table_max: float = 3.0,
    tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """(S, C) table, (B, T, C) inputs -> (B, T, C) interpolated lookups."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = x.shape
    s = table.shape[0]
    rows = b * t
    pad = (-rows) % tile
    x2 = x.reshape(rows, c)
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    n_tiles = (rows + pad) // tile

    out = pl.pallas_call(
        functools.partial(
            _lookup_kernel, table_min=table_min, table_max=table_max
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + pad, c), x.dtype),
        interpret=interpret,
    )(x2, table)
    return out[:rows].reshape(b, t, c)
