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


def upsampled_chain(shaper, p, exciter, film_c):
    from neural_waveshaping_synthesis_tpu.ops.upsample import linear_upsample

    fp = linear_upsample(film_c, exciter.shape[1])
    return reference_chain(shaper, p, exciter, fp)


@pytest.fixture(scope="module")
def setup_cr():
    newt = NEWT()
    params = newt.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(7)
    b, tc, hop = 2, 6, 16
    ta = tc * hop
    exciter = jnp.asarray(
        (rng.standard_normal((b, ta, 64)) * 0.5).astype(np.float32)
    )
    film_c = jnp.asarray(rng.standard_normal((b, tc, 256)).astype(np.float32))
    return newt, params, exciter, film_c, hop


def test_cr_film_interpolation_bit_exact():
    """The in-kernel film interpolation (_interp_w_cr/_film_planes_cr),
    evaluated per tile, reproduces linear_upsample BIT-exactly: same
    single division of the same exact-integer operands, same lerp
    expression. (The full kernel OUTPUT is only ulp-close to the
    audio-rate kernel — see test_cr_forward_matches_fl_kernel — because
    the lerp runs inside a different compiled program, where FMA
    contraction is allowed; CLAUDE.md rule 10's cross-program class.)"""
    from neural_waveshaping_synthesis_tpu.ops.upsample import linear_upsample

    rng = np.random.default_rng(0)
    b, tc, hop = 2, 6, 16
    ta = tc * hop
    cc = 4 * newt_fused.C
    film_c = jnp.asarray(rng.standard_normal((b, tc, cc)).astype(np.float32))
    ref = np.asarray(linear_upsample(film_c, ta))
    windows = np.asarray(newt_fused._windows_cr(film_c))
    film_pad = np.asarray(newt_fused._pad_film_cr(film_c))
    tpb = tc // 2
    # the window builder delivers padded frames [2j, 2j+4) to tile j
    for g in range(b * tpb):
        bb, j = g // tpb, g % tpb
        np.testing.assert_array_equal(
            windows[g], film_pad[bb, 2 * j : 2 * j + 4]
        )
    out = np.zeros((b, ta, cc), np.float32)
    for g in range(b * tpb):
        bb, j = g // tpb, g % tpb
        irel, _, w32 = newt_fused._interp_w_cr(hop, j == 0, jnp.float32)
        planes = newt_fused._film_planes_cr(
            jnp.asarray(windows[g]), irel, w32, jnp.float32
        )
        for a, plane in enumerate(planes):
            p2 = np.asarray(plane).reshape(2 * hop, newt_fused.C)
            out[bb, 2 * hop * j : 2 * hop * (j + 1),
                a * newt_fused.C : (a + 1) * newt_fused.C] = p2
    np.testing.assert_array_equal(out, ref)


def test_cr_forward_matches_fl_kernel(setup_cr):
    """CR kernel vs the audio-rate full-lane kernel fed
    linear_upsample's output: identical math, so the only difference is
    cross-program FMA contraction of the lerp (≤1 ulp on the film,
    ~1e-6 after the sine chain)."""
    from neural_waveshaping_synthesis_tpu.ops.upsample import linear_upsample

    newt, params, exciter, film_c, hop = setup_cr
    weights = newt_fused.pack_weights_fl(params["shaping_fn"])
    fp = linear_upsample(film_c, exciter.shape[1])
    ref = newt_fused.film_shaper_fused_fl(exciter, fp, weights, hop, True)
    out = newt_fused.film_shaper_fused_cr(exciter, film_c, weights, hop, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=2e-6
    )
    # and the usual kernel-vs-einsum-chain tolerance vs the XLA graph
    chain = upsampled_chain(newt.shaping_fn, params, exciter, film_c)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(chain), rtol=1e-4, atol=1e-5
    )


def test_cr_forward_non_pow2_hop():
    """Even non-power-of-two hops keep the chain-exact weight division
    (the reference's hop is whatever sr/control_rate lands on). The
    kernel MATH is hop-generic (exercised here in interpret mode), but
    supports_cr gates such hops off the compiled path: a (10, 2C) row
    block violates Mosaic's sublane-divisible-by-8 constraint."""
    from neural_waveshaping_synthesis_tpu.ops.upsample import linear_upsample

    newt = NEWT()
    params = newt.init(jax.random.PRNGKey(4))
    rng = np.random.default_rng(11)
    b, tc, hop = 1, 4, 10
    exciter = jnp.asarray(
        (rng.standard_normal((b, tc * hop, 64)) * 0.5).astype(np.float32)
    )
    film_c = jnp.asarray(rng.standard_normal((b, tc, 256)).astype(np.float32))
    assert not newt_fused.supports_cr(newt.shaping_fn, tc * hop, tc)
    weights = newt_fused.pack_weights_fl(params["shaping_fn"])
    fp = linear_upsample(film_c, tc * hop)
    ref = newt_fused.film_shaper_fused_fl(exciter, fp, weights, hop, True)
    out = newt_fused.film_shaper_fused_cr(exciter, film_c, weights, hop, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=2e-6
    )


def test_cr_gradients_match_autodiff(setup_cr):
    """Grads through the CR kernel — including the in-kernel upsample
    transpose (segment-sum into control frames) — match autodiff
    through linear_upsample + the chain."""
    newt, params, exciter, film_c, hop = setup_cr

    def loss_fused(exc, f, sp):
        w = newt_fused.pack_weights_fl(sp)
        return jnp.sum(
            newt_fused.film_shaper_fused_cr(exc, f, w, hop, True) ** 2
        )

    def loss_ref(exc, f, sp):
        return jnp.sum(
            upsampled_chain(newt.shaping_fn, {"shaping_fn": sp}, exc, f) ** 2
        )

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(
        exciter, film_c, params["shaping_fn"]
    )
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        exciter, film_c, params["shaping_fn"]
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_fused), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-2
        )


def test_cr_head_and_tail_clamp_gradients(setup_cr):
    """The edge-replica padding's transpose: cotangents of the clamped
    head (first half-hop) and tail regions fold onto frames 0 and Tc-1.
    Checked by differentiating a loss that only reads those regions."""
    newt, params, exciter, film_c, hop = setup_cr

    def loss(f, fn):
        w = newt_fused.pack_weights_fl(params["shaping_fn"])
        out = fn(exciter, f, w)
        return jnp.sum(out[:, : hop // 2] ** 2) + jnp.sum(
            out[:, -hop:] ** 2
        )

    g_fused = jax.grad(
        lambda f: loss(
            f, lambda e, f_, w: newt_fused.film_shaper_fused_cr(e, f_, w, hop, True)
        )
    )(film_c)
    g_ref = jax.grad(
        lambda f: loss(
            f,
            lambda e, f_, w: upsampled_chain(
                newt.shaping_fn, params, e, f_
            ),
        )
    )(film_c)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )


def test_newt_apply_cr_matches_default(setup_cr):
    """NEWT.apply(fused='full_lane_cr'): ulp-close to the audio-rate
    full-lane kernel path, tolerance-close to the default einsum path
    (same bound as every other kernel-vs-chain test)."""
    newt, params, exciter, _, _ = setup_cr
    rng = np.random.default_rng(5)
    emb = jnp.asarray(
        rng.standard_normal((2, 6, newt.control_embedding_size)), jnp.float32
    )
    out = newt.apply(params, exciter, emb, fused="full_lane_cr")
    fl = newt.apply(params, exciter, emb, fused="full_lane")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(fl), rtol=1e-5, atol=2e-6
    )
    ref = newt.apply(params, exciter, emb)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_newt_apply_cr_falls_back_on_odd_control_length(setup):
    """Unsupported geometry (odd Tc, as in this fixture's Tc=5) falls
    back to the audio-rate full-lane kernel path, not an error."""
    newt, params, exciter, _ = setup
    rng = np.random.default_rng(6)
    emb = jnp.asarray(
        rng.standard_normal((2, 5, newt.control_embedding_size)), jnp.float32
    )
    assert not newt_fused.supports_cr(newt.shaping_fn, 600, 5)
    ref = newt.apply(params, exciter[:, :600], emb)
    out = newt.apply(params, exciter[:, :600], emb, fused="full_lane_cr")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_supports_cr_mosaic_hop_gates():
    """The compiled-path gate excludes hops Mosaic can't lower (sublane
    not divisible by 8) and hops whose backward would overflow the
    ~16 MB scoped-VMEM budget (hop > 256) — these must FALL BACK, not
    error at compile time on a real TPU (r4 advisor findings)."""
    newt = NEWT()
    cfg = newt.shaping_fn
    assert newt_fused.supports_cr(cfg, 128 * 8, 8)  # shipped hop=128
    assert newt_fused.supports_cr(cfg, 256 * 8, 8)  # VMEM cap boundary
    assert not newt_fused.supports_cr(cfg, 10 * 4, 4)  # hop=10: sublane
    assert not newt_fused.supports_cr(cfg, 12 * 4, 4)  # hop=12: sublane
    assert not newt_fused.supports_cr(cfg, 512 * 8, 8)  # hop=512: VMEM
    assert not newt_fused.supports_stream(cfg, 512 * 8, 8)


def test_newt_apply_cr_inference_spelling_falls_back_to_chain(setup):
    """The inference default spelling 'cr' (NEWT.fused field default)
    falls back to the XLA CHAIN on unsupported geometry — bit-exact
    with the plain path, because it IS the plain path (full_lane
    forward-only loses to the chain, so inference must not drop to
    it). On CPU the backend gate means fused=None is also the chain,
    which keeps every existing test's reference semantics."""
    newt, params, exciter, _ = setup
    assert newt.fused == "cr"  # inference default engages on TPU only
    rng = np.random.default_rng(6)
    emb = jnp.asarray(
        rng.standard_normal((2, 5, newt.control_embedding_size)), jnp.float32
    )
    ref = newt.apply(params, exciter[:, :600], emb)
    out = newt.apply(params, exciter[:, :600], emb, fused="cr")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_cr_bf16_forward(setup_cr):
    newt, params, exciter, film_c, hop = setup_cr
    to_bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t
    )
    sp16 = to_bf16(params["shaping_fn"])
    exc16, f16 = to_bf16(exciter), to_bf16(film_c)
    ref16 = upsampled_chain(
        newt.shaping_fn, {"shaping_fn": sp16}, exc16, f16
    )
    w16 = newt_fused.pack_weights_fl(sp16)
    out16 = newt_fused.film_shaper_fused_cr(exc16, f16, w16, hop, True)
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(ref16, np.float32),
        rtol=0.08, atol=0.08,
    )


def test_cr_mixed_dtype_f32_film_bf16_exciter(setup_cr):
    """The NEWT.cr_film_f32 A/B path: f32 control-rate film windows
    with bf16 exciter/weights/output. The kernel derives plane and
    output dtypes from the exciter, so the mixed call must (a) run,
    (b) track the all-f32 kernel within bf16 rounding, and (c) produce
    finite f32 gradients for film and weights through the custom VJP."""
    newt, params, exciter, film_c, hop = setup_cr
    to_bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t
    )
    sp16 = to_bf16(params["shaping_fn"])
    w16 = newt_fused.pack_weights_fl(sp16)
    exc16 = exciter.astype(jnp.bfloat16)
    out = newt_fused.film_shaper_fused_cr(exc16, film_c, w16, hop, True)
    assert out.dtype == jnp.bfloat16
    ref = newt_fused.film_shaper_fused_cr(
        exciter, film_c, newt_fused.pack_weights_fl(params["shaping_fn"]),
        hop, True,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.08, atol=0.08
    )

    def loss(f, e, w):
        return jnp.sum(
            newt_fused.film_shaper_fused_cr(e, f, w, hop, True).astype(
                jnp.float32
            )
            ** 2
        )

    df, de, dw = jax.grad(loss, argnums=(0, 1, 2))(film_c, exc16, w16)
    assert df.dtype == jnp.float32 and de.dtype == jnp.bfloat16
    for g in (df, de, *dw):
        assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_newt_apply_cr_film_f32_field(setup_cr):
    """NEWT(cr_film_f32=True) is a no-op under f32 compute (bit-exact
    with the default) — the field only changes bf16 calls."""
    newt, params, exciter, film_c, hop = setup_cr
    import dataclasses

    emb = jnp.asarray(
        np.random.default_rng(3).standard_normal(
            (exciter.shape[0], film_c.shape[1], newt.control_embedding_size)
        ),
        jnp.float32,
    )
    newt_ab = dataclasses.replace(newt, cr_film_f32=True)
    ref = newt.apply(params, exciter, emb, fused="full_lane_cr")
    out = newt_ab.apply(params, exciter, emb, fused="full_lane_cr")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


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


# ---------------------------------------------------------------------------
# streaming (segment-ramp) variant
# ---------------------------------------------------------------------------
def _segment_ramp_chain(newt, params, exciter, prev_film, film_c, hop):
    """The streaming/synth.py step-5 chain, extracted: segment-ramp
    film interpolation + FiLM -> shaper -> FiLM (pre-mixer)."""
    from neural_waveshaping_synthesis_tpu.streaming.synth import (
        _segment_interp,
    )

    c = newt.n_waveshapers
    film_aud = _segment_interp(prev_film, film_c, hop)
    gi, bi, gn, bn = (
        film_aud[..., :c],
        film_aud[..., c : 2 * c],
        film_aud[..., 2 * c : 3 * c],
        film_aud[..., 3 * c :],
    )
    x = gi * exciter + bi
    x = newt.shaping_fn.apply(params["shaping_fn"], x)
    return gn * x + bn


@pytest.fixture(scope="module")
def setup_stream():
    newt = NEWT()
    params = newt.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(13)
    b, k, hop = 2, 6, 16
    exciter = jnp.asarray(
        (rng.standard_normal((b, k * hop, 64)) * 0.5).astype(np.float32)
    )
    film_c = jnp.asarray(rng.standard_normal((b, k, 256)).astype(np.float32))
    prev = jnp.asarray(rng.standard_normal((b, 256)).astype(np.float32))
    return newt, params, exciter, prev, film_c, hop


def test_stream_kernel_windows_and_ramp_bit_exact():
    """The in-kernel segment ramp (_interp_w_stream + _film_planes
    _stream over _windows_stream), evaluated per tile, reproduces
    streaming/synth.py _segment_interp BIT-exactly: same
    ``(o+1)/hop`` division, same ``start + (end-start)*t`` lerp form."""
    from neural_waveshaping_synthesis_tpu.streaming.synth import (
        _segment_interp,
    )

    rng = np.random.default_rng(1)
    b, k, hop = 2, 6, 16
    cc = 4 * newt_fused.C
    film_c = jnp.asarray(rng.standard_normal((b, k, cc)).astype(np.float32))
    prev = jnp.asarray(rng.standard_normal((b, cc)).astype(np.float32))
    ref = np.asarray(_segment_interp(prev, film_c, hop))
    windows = np.asarray(newt_fused._windows_stream(prev, film_c))
    prepended = np.concatenate([np.asarray(prev)[:, None], np.asarray(film_c)], axis=1)
    tpb = k // 2
    for g in range(b * tpb):
        bb, j = g // tpb, g % tpb
        # rows 0..2 must be prepended frames [2j, 2j+3) (row 3 slack)
        np.testing.assert_array_equal(
            windows[g, :3], prepended[bb, 2 * j : 2 * j + 3]
        )
    out = np.zeros((b, k * hop, cc), np.float32)
    irel, w32 = newt_fused._interp_w_stream(hop)
    for g in range(b * tpb):
        bb, j = g // tpb, g % tpb
        planes = newt_fused._film_planes_stream(
            jnp.asarray(windows[g]), irel, w32, jnp.float32
        )
        for a, plane in enumerate(planes):
            p2 = np.asarray(plane).reshape(2 * hop, newt_fused.C)
            out[bb, 2 * hop * j : 2 * hop * (j + 1),
                a * newt_fused.C : (a + 1) * newt_fused.C] = p2
    np.testing.assert_array_equal(out, ref)


def test_stream_kernel_matches_chain(setup_stream):
    newt, params, exciter, prev, film_c, hop = setup_stream
    ref = _segment_ramp_chain(newt, params, exciter, prev, film_c, hop)
    w = newt_fused.pack_weights_fl(params["shaping_fn"])
    out = newt_fused.film_shaper_fused_stream(
        exciter, prev, film_c, w, hop, True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_stream_kernel_cross_buffer_continuity(setup_stream):
    """Two consecutive buffers through the kernel == one double-length
    buffer: the carried prev_film handoff preserves the ramp exactly
    (same guarantee the chain's _segment_interp gives)."""
    newt, params, exciter, prev, film_c, hop = setup_stream
    b, k = film_c.shape[:2]
    w = newt_fused.pack_weights_fl(params["shaping_fn"])
    whole = newt_fused.film_shaper_fused_stream(
        exciter, prev, film_c, w, hop, True
    )
    split = 2  # even-frame buffers: 2 + 4
    cut = split * hop
    first = newt_fused.film_shaper_fused_stream(
        exciter[:, :cut], prev, film_c[:, :split], w, hop, True
    )
    second = newt_fused.film_shaper_fused_stream(
        exciter[:, cut:], film_c[:, split - 1], film_c[:, split:],
        w, hop, True,
    )
    np.testing.assert_array_equal(
        np.asarray(whole),
        np.concatenate([np.asarray(first), np.asarray(second)], axis=1),
    )


def test_streaming_step_fused_flag_is_inert_on_cpu():
    """StreamingSynth.step gates the kernel to the TPU backend: with
    NEWT.fused set (the shipped default) the CPU step must still take
    the chain and match a fused=None model bit-exactly."""
    from dataclasses import replace

    from neural_waveshaping_synthesis_tpu.models.neural_waveshaping import (
        NeuralWaveshaping,
    )
    from neural_waveshaping_synthesis_tpu.streaming.synth import (
        StreamingSynth,
    )

    model = NeuralWaveshaping()
    assert model.newt.fused == "cr"
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(2)
    f0 = jnp.asarray(
        (220.0 + 20 * rng.random((1, 8))).astype(np.float32)
    )
    ctrl = jnp.asarray(rng.standard_normal((1, 8, 2)).astype(np.float32))

    outs = []
    for fused in ["cr", None]:
        synth = StreamingSynth(
            replace(model, newt=replace(model.newt, fused=fused)), 8
        )
        state = synth.init_state(params, 1, key)
        audio, _ = synth.step(params, state, f0, ctrl)
        outs.append(np.asarray(audio))
    np.testing.assert_array_equal(outs[0], outs[1])


# ---------------------------------------------------------------------------
# exciter-fused (xcr) kernel: bank + mixer computed in-kernel
# ---------------------------------------------------------------------------
def _xcr_inputs(seed=13, b=2, tc=6, hop=16, n_harm=101, sr=16000.0):
    from neural_waveshaping_synthesis_tpu.ops import oscillator

    rng = np.random.default_rng(seed)
    ta = tc * hop
    f0 = jnp.asarray(
        (220.0 * 2.0 ** rng.uniform(0, 3, (b, ta))).astype(np.float32)
    )  # up to ~1.7 kHz so the antialias mask zeroes real lanes
    phase = jnp.mod(oscillator.phase_accumulate(f0, sr), oscillator.TAU)
    offsets = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (n_harm,)).astype(np.float32)
    )
    film_c = jnp.asarray(rng.standard_normal((b, tc, 256)).astype(np.float32))
    return f0, phase, offsets, film_c


def _xcr_chain(newt, params, mixer_p, f0, phase, offsets, film_c, n_harm, sr):
    """The XLA graph the xcr kernel fuses: bank_from_phase -> mixer
    dense -> upsampled FiLM/shaper/FiLM chain."""
    from neural_waveshaping_synthesis_tpu.models.modules import dense_apply
    from neural_waveshaping_synthesis_tpu.ops.oscillator import bank_from_phase

    bank = bank_from_phase(phase, f0, n_harm, sr, offsets)
    exciter = dense_apply(mixer_p, bank)
    return upsampled_chain(newt.shaping_fn, params, exciter, film_c)


@pytest.fixture(scope="module")
def setup_xcr():
    newt = NEWT()
    params = newt.init(jax.random.PRNGKey(5))
    mixer_p = {
        "w": jax.random.normal(jax.random.PRNGKey(6), (101, 64)) * 0.1,
        "b": jax.random.normal(jax.random.PRNGKey(7), (64,)) * 0.1,
    }
    f0, phase, offsets, film_c = _xcr_inputs()
    return newt, params, mixer_p, f0, phase, offsets, film_c


def test_xcr_forward_matches_chain(setup_xcr):
    newt, params, mixer_p, f0, phase, offsets, film_c = setup_xcr
    n_harm, sr, hop = 101, 16000.0, 16
    assert newt_fused.supports_xcr(
        newt.shaping_fn, f0.shape[1], film_c.shape[1], n_harm
    )
    ref = _xcr_chain(
        newt, {"shaping_fn": params["shaping_fn"]}, mixer_p,
        f0, phase, offsets, film_c, n_harm, sr,
    )
    out = newt_fused.bank_film_shaper_fused_xcr(
        phase, f0, newt_fused.pack_offsets(offsets, n_harm), film_c,
        newt_fused.pack_mixer(mixer_p),
        newt_fused.pack_weights_fl(params["shaping_fn"]),
        n_harm, sr, hop, True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_xcr_gradients_match_autodiff(setup_xcr):
    """Grads through the xcr kernel w.r.t. the control-rate film, the
    harmonic-mixer dense params (via pack_mixer's pad/concat VJP), and
    the shaper pytree (via pack_weights_fl) match autodiff through the
    unfused bank -> dense -> upsample -> chain graph. Phase/f0 carry
    zero cotangents by design (data, not parameters)."""
    newt, params, mixer_p, f0, phase, offsets, film_c = setup_xcr
    n_harm, sr, hop = 101, 16000.0, 16

    def loss_fused(f, mp, sp):
        out = newt_fused.bank_film_shaper_fused_xcr(
            phase, f0, newt_fused.pack_offsets(offsets, n_harm), f,
            newt_fused.pack_mixer(mp), newt_fused.pack_weights_fl(sp),
            n_harm, sr, hop, True,
        )
        return jnp.sum(out ** 2)

    def loss_ref(f, mp, sp):
        out = _xcr_chain(
            newt, {"shaping_fn": sp}, mp, f0, phase, offsets, f, n_harm, sr
        )
        return jnp.sum(out ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(
        film_c, mixer_p, params["shaping_fn"]
    )
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        film_c, mixer_p, params["shaping_fn"]
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_fused), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-2
        )


def test_xcr_phase_f0_zero_cotangents(setup_xcr):
    newt, params, mixer_p, f0, phase, offsets, film_c = setup_xcr
    n_harm, sr, hop = 101, 16000.0, 16

    def loss(ph, ff):
        out = newt_fused.bank_film_shaper_fused_xcr(
            ph, ff, newt_fused.pack_offsets(offsets, n_harm), film_c,
            newt_fused.pack_mixer(mixer_p),
            newt_fused.pack_weights_fl(params["shaping_fn"]),
            n_harm, sr, hop, True,
        )
        return jnp.sum(out)

    gp, gf = jax.grad(loss, argnums=(0, 1))(phase, f0)
    assert not np.asarray(gp).any() and not np.asarray(gf).any()


def test_supports_xcr_gates():
    newt = NEWT()
    assert newt_fused.supports_xcr(newt.shaping_fn, 96, 6, 101)
    assert newt_fused.supports_xcr(newt.shaping_fn, 96, 6, 128)
    assert not newt_fused.supports_xcr(newt.shaping_fn, 96, 6, 129)
    assert not newt_fused.supports_xcr(newt.shaping_fn, 96, 6, 1)
    # inherits the cr geometry gates
    assert not newt_fused.supports_xcr(newt.shaping_fn, 60, 6, 101)  # hop 10
    assert not newt_fused.supports_xcr(newt.shaping_fn, 80, 5, 101)  # tc odd


def test_xfull_forward_matches_xcr_plus_mixer(setup_xcr):
    """xfull (out-mixer folded in, pre-bias audio out) == the XLA
    output-mixer dense applied to the xcr kernel's shaped signal. Both
    run the identical in-kernel pre-mix computation; only the 64->1
    reduction moves, so parity is tight."""
    newt, params, mixer_p, f0, phase, offsets, film_c = setup_xcr
    n_harm, sr, hop = 101, 16000.0, 16
    out_p = params["mixer"]
    common = (
        phase, f0, newt_fused.pack_offsets(offsets, n_harm), film_c,
        newt_fused.pack_mixer(mixer_p),
    )
    weights = newt_fused.pack_weights_fl(params["shaping_fn"])
    shaped = newt_fused.bank_film_shaper_fused_xcr(
        *common, weights, n_harm, sr, hop, True,
    )
    from neural_waveshaping_synthesis_tpu.models.modules import dense_apply

    ref = dense_apply(out_p, shaped)[..., 0]
    audio = newt_fused.bank_newt_fused_xfull(
        *common, newt_fused.pack_out_mixer(out_p), weights,
        n_harm, sr, hop, True,
    ) + out_p["b"][0]
    np.testing.assert_allclose(
        np.asarray(audio), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_xfull_gradients_match_autodiff(setup_xcr):
    """Grads through xfull w.r.t. film, harmonic-mixer params, the
    out-mixer params (weight via pack_out_mixer's concat VJP, bias via
    the outside-the-kernel add), and the shaper pytree match autodiff
    through the fully unfused graph."""
    newt, params, mixer_p, f0, phase, offsets, film_c = setup_xcr
    n_harm, sr, hop = 101, 16000.0, 16

    def loss_fused(f, mp, op, sp):
        audio = newt_fused.bank_newt_fused_xfull(
            phase, f0, newt_fused.pack_offsets(offsets, n_harm), f,
            newt_fused.pack_mixer(mp), newt_fused.pack_out_mixer(op),
            newt_fused.pack_weights_fl(sp), n_harm, sr, hop, True,
        ) + op["b"][0]
        return jnp.sum(audio ** 2)

    def loss_ref(f, mp, op, sp):
        from neural_waveshaping_synthesis_tpu.models.modules import (
            dense_apply,
        )

        x = _xcr_chain(
            newt, {"shaping_fn": sp}, mp, f0, phase, offsets, f, n_harm, sr
        )
        return jnp.sum(dense_apply(op, x)[..., 0] ** 2)

    args = (film_c, mixer_p, params["mixer"], params["shaping_fn"])
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_fused), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-2
        )


def test_model_fused_out_mixer_ab_paths_match():
    """Model-level A/B: fuse_out_mixer=True (xfull) and False (xcr +
    XLA mixer) agree through _fused_exciter_newt."""
    from dataclasses import replace

    from neural_waveshaping_synthesis_tpu.models.neural_waveshaping import (
        NeuralWaveshaping,
    )
    from neural_waveshaping_synthesis_tpu.ops.upsample import linear_upsample

    model = NeuralWaveshaping(
        control_hop=16, fuse_exciter=True, fuse_out_mixer=True
    )
    params = model.init(jax.random.PRNGKey(11))
    rng = np.random.default_rng(31)
    b, tc = 2, 6
    f0 = jnp.asarray(
        (220.0 * 2.0 ** rng.uniform(0, 2, (b, tc))).astype(np.float32)
    )
    f0_up = linear_upsample(f0[..., None], tc * 16)[..., 0]
    control = jnp.asarray(rng.standard_normal((b, tc, 2)).astype(np.float32))
    embedding, _ = model.get_embedding(params, control)
    offsets = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (101,)).astype(np.float32)
    )
    out_full = model._fused_exciter_newt(
        params, f0_up, embedding, None, offsets, force=True
    )
    out_xcr = replace(model, fuse_out_mixer=False)._fused_exciter_newt(
        params, f0_up, embedding, None, offsets, force=True
    )
    assert out_full is not None and out_xcr is not None
    assert out_full.shape == out_xcr.shape == (b, tc * 16, 1)
    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(out_xcr), rtol=1e-4, atol=1e-5
    )


def test_model_fused_exciter_matches_unfused():
    """The model-level fused path (NeuralWaveshaping._fused_exciter_newt,
    forced past its TPU gate) reproduces render_exciter + NEWT.apply
    with the same explicit phase offsets."""
    from neural_waveshaping_synthesis_tpu.models.neural_waveshaping import (
        NeuralWaveshaping,
    )

    model = NeuralWaveshaping(control_hop=16)
    params = model.init(jax.random.PRNGKey(8))
    rng = np.random.default_rng(17)
    b, tc = 2, 6
    f0 = jnp.asarray(
        (220.0 * 2.0 ** rng.uniform(0, 2, (b, tc))).astype(np.float32)
    )
    from neural_waveshaping_synthesis_tpu.ops.upsample import linear_upsample

    f0_up = linear_upsample(f0[..., None], tc * 16)[..., 0]
    control = jnp.asarray(rng.standard_normal((b, tc, 2)).astype(np.float32))
    embedding, _ = model.get_embedding(params, control)
    offsets = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (101,)).astype(np.float32)
    )
    fused = model._fused_exciter_newt(
        params, f0_up, embedding, None, offsets, force=True
    )
    assert fused is not None
    exciter = model.render_exciter(params, f0_up, phase_offset=offsets)
    ref = model.newt.apply(params["newt"], exciter, embedding, fused=False)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_model_fused_exciter_bf16():
    """bf16 compute dtype: the fused path keeps the bank/mix in f32
    in-kernel and rounds once at the exciter (the chain rounds the bank
    BEFORE the mix), so parity is bf16-loose by construction."""
    from dataclasses import replace

    from neural_waveshaping_synthesis_tpu.models.neural_waveshaping import (
        NeuralWaveshaping,
    )
    from neural_waveshaping_synthesis_tpu.ops.upsample import linear_upsample

    model = NeuralWaveshaping(control_hop=16, compute_dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(9))
    rng = np.random.default_rng(23)
    b, tc = 2, 6
    f0 = jnp.asarray(
        (220.0 * 2.0 ** rng.uniform(0, 2, (b, tc))).astype(np.float32)
    )
    f0_up = linear_upsample(f0[..., None], tc * 16)[..., 0]
    control = jnp.asarray(rng.standard_normal((b, tc, 2)).astype(np.float32))
    embedding, _ = model.get_embedding(params, control)
    offsets = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (101,)).astype(np.float32)
    )
    fused = model._fused_exciter_newt(
        params, f0_up, embedding, None, offsets, force=True
    )
    assert fused is not None and fused.dtype == jnp.float32
    exciter = model.render_exciter(params, f0_up, phase_offset=offsets)
    newt_p = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params["newt"]
    )
    ref = model.newt.apply(
        newt_p, exciter.astype(jnp.bfloat16),
        embedding.astype(jnp.bfloat16), fused=False,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref, dtype=np.float32),
        rtol=0.1, atol=0.05,
    )


def test_model_apply_fuse_exciter_gate_inert_on_cpu():
    """On the CPU backend model.apply must take the unfused path even
    with fuse_exciter=True — outputs identical to a fuse_exciter=False
    model."""
    from dataclasses import replace

    from neural_waveshaping_synthesis_tpu.models.generators import (
        FIRNoiseSynth,
    )
    from neural_waveshaping_synthesis_tpu.models.neural_waveshaping import (
        NeuralWaveshaping,
    )

    model = NeuralWaveshaping(
        control_hop=16,
        noise_synth=FIRNoiseSynth(hop_length=16),
        fuse_exciter=True,
        fuse_out_mixer=True,
    )
    params = model.init(jax.random.PRNGKey(10))
    rng = np.random.default_rng(29)
    f0 = jnp.asarray(
        (220.0 + 30 * rng.random((1, 6))).astype(np.float32)
    )
    control = jnp.asarray(rng.standard_normal((1, 6, 2)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    out_a = model.apply(params, f0, control, key=key)
    out_b = replace(model, fuse_exciter=False).apply(
        params, f0, control, key=key
    )
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
