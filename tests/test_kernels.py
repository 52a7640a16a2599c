"""Pallas kernel tests (interpret mode on the CPU test platform)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_waveshaping_synthesis_tpu.kernels import fast_newt_lookup_pallas
from neural_waveshaping_synthesis_tpu.models.newt import fast_newt_lookup


def test_fast_newt_kernel_matches_reference_lookup(rng):
    table = jnp.asarray(rng.standard_normal((4096, 64)).astype(np.float32))
    x = jnp.asarray((rng.standard_normal((2, 1000, 64)) * 2).astype(np.float32))
    ref = fast_newt_lookup(table, x)
    out = fast_newt_lookup_pallas(table, x, interpret=True)
    # within-bin float-order jitter only (bin width 6/4096); no
    # off-by-one-bin errors, which on a randn table would be O(1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_fast_newt_kernel_edge_clamping(rng):
    """Inputs far outside [min, max] clamp to the edge bins."""
    table = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    x = jnp.asarray(np.full((1, 8, 64), 100.0, np.float32))
    out = fast_newt_lookup_pallas(table, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(np.asarray(table[-1]), (1, 8, 64)),
        rtol=1e-5,
    )
    x_lo = jnp.asarray(np.full((1, 8, 64), -100.0, np.float32))
    out_lo = np.asarray(fast_newt_lookup_pallas(table, x_lo, interpret=True))
    # lower clamps to bin 0 but fract is hugely negative * (t1-t0):
    # the reference arithmetic extrapolates below the table; ours must
    # match it exactly rather than "fix" it
    ref_lo = np.asarray(fast_newt_lookup(table, x_lo))
    np.testing.assert_allclose(out_lo, ref_lo, rtol=1e-3)


def test_fast_newt_kernel_non_tile_multiple(rng):
    """Row counts that don't divide the tile size pad+trim correctly."""
    table = jnp.asarray(rng.standard_normal((512, 64)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((3, 333, 64)).astype(np.float32))
    ref = fast_newt_lookup(table, x, -3.0, 3.0)
    out = fast_newt_lookup_pallas(table, x, tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)
