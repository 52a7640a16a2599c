"""Control-rate → audio-rate upsampling.

``linear_upsample`` reproduces ``torch.nn.functional.interpolate(...,
mode="linear", align_corners=False)`` semantics exactly — the reference
uses it in two hot places (f0 upsampling, reference
``models/neural_waveshaping.py:75``, and FiLM-parameter upsampling,
``models/modules/shaping.py:69``), so sample-index alignment here is a
checkpoint-parity requirement.

``cubic_upsample`` / ``overlap_add_upsample`` mirror the reference's
optional interpolators (``data/utils/upsampling.py:37-79``) in JAX.

All functions take channels-last ``(B, T, C)`` input with time on
axis 1 — gathers along a leading-ish axis keep the 128-lane channel
axis contiguous on TPU.
"""
import jax.numpy as jnp

from .windows import hann_window


def _source_positions(in_len: int, out_len: int) -> jnp.ndarray:
    """Fractional source index for each output sample (align_corners=False)."""
    scale = in_len / out_len
    pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    return jnp.clip(pos, 0.0, float(in_len - 1))


def _linear_upsample_integer(x: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Gather-free align_corners=False upsampling by an integer factor.

    Semantics identity: output sample s = m*hop + o has source position
    pos = (s+0.5)/hop - 0.5 = m + (2o+1-hop)/(2*hop), clipped to
    [0, T-1]. Offsets with 2o+1 < hop interpolate x[m-1] -> x[m] at
    weight (2o+1+hop)/(2*hop); the rest interpolate x[m] -> x[m+1] at
    weight (2o+1-hop)/(2*hop). The first hop//2 samples clip to x[0]
    and the tail past (T-1)*hop clips to x[T-1] (which the final
    block's x[T-1] -> x[T-1] ramp reproduces).

    Why not the obvious take()-based form: its BACKWARD is a scatter-add
    over out_len rows, which executes catastrophically on TPU (~330 ms
    per training step measured — 600x the rest of the step combined).
    This form is reshape+broadcast; its backward is a dense reduction.

    Formulation note: an earlier form computed the hop-aligned ramp
    tensor lerp(x[m], x[m+1], (o+0.5)/hop) and then shifted it by
    hop//2 (prepend-head + slice — which at training shapes moved
    three ~0.5 GB tensors per step: a materialized broadcast, a
    near-full-length slice, and its backward pad, ~7 ms/step
    profiled). That shift trick equals the true align_corners=False
    weights only for EVEN hop (it lands weights (o±hop//2+0.5)/hop,
    and (2o+1±hop)/(2*hop) needs the half-sample 0.5 only when hop is
    odd-split); the fused form here applies the exact weights per
    offset directly — no concat/slice, one fused output write, all
    integer hops (regression-tested against F.interpolate for both
    parities).

    float64 + even hop takes the shift-by-concat form below, which the
    fit-equivalence tests pinned: the fused form's backward sums THREE
    masked shifted cotangent contributions per input row (x appears as
    lerp left, lerp right, and via the xm1/xp1 shifts), and XLA's
    reassociation of that sum differs between differently-sharded
    programs — measured 8.4e-9 step-3 f64 loss drift between
    mesh-1/mesh-2 fit programs vs 1.3e-13 with the two-contribution
    form, which Adam amplifies into trajectory divergence over a
    120-step fit (tests/test_training.py
    test_fit_level_equivalence_across_mesh_sizes). f64 exists solely
    to serve that exact-equivalence contract (whose configs all use
    even hops); the perf path is f32/bf16.
    """
    b, t, c = x.shape
    half = hop // 2
    if jnp.result_type(x) == jnp.float64 and hop % 2 == 0:
        hi = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
        w = ((jnp.arange(hop, dtype=x.dtype) + 0.5) / hop)[None, None, :, None]
        mid = x[:, :, None, :] * (1.0 - w) + hi[:, :, None, :] * w
        mid = mid.reshape(b, t * hop, c)
        head = jnp.broadcast_to(x[:, :1, :], (b, half, c))
        return jnp.concatenate([head, mid[:, : t * hop - half, :]], axis=1)
    xm1 = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)  # x[m-1], clamped
    xp1 = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)  # x[m+1], clamped
    num = 2.0 * jnp.arange(hop, dtype=x.dtype) + 1.0  # 2o+1, exact
    is_lo = 2 * jnp.arange(hop) + 1 < hop
    w = jnp.where(is_lo, (num + hop) / (2 * hop), (num - hop) / (2 * hop))
    w4 = w[None, None, :, None]
    lo4 = is_lo[None, None, :, None]
    left = jnp.where(lo4, xm1[:, :, None, :], x[:, :, None, :])
    right = jnp.where(lo4, x[:, :, None, :], xp1[:, :, None, :])
    head4 = lo4 & (jnp.arange(t)[None, :, None, None] == 0)
    out = jnp.where(head4, left, left * (1.0 - w4) + right * w4)
    return out.reshape(b, t * hop, c)


def linear_upsample(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Linear interpolation along axis 1 of (B, T, C) -> (B, out_len, C)."""
    in_len = x.shape[1]
    if out_len % in_len == 0:
        return _linear_upsample_integer(x, out_len // in_len)
    pos = _source_positions(in_len, out_len)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_len - 1)
    w = (pos - i0.astype(jnp.float32))[None, :, None]
    x0 = jnp.take(x, i0, axis=1)
    x1 = jnp.take(x, i1, axis=1)
    return x0 * (1.0 - w) + x1 * w


def cubic_upsample(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Catmull-Rom cubic interpolation along axis 1 of (B, T, C)."""
    in_len = x.shape[1]
    pos = _source_positions(in_len, out_len)
    i1 = jnp.floor(pos).astype(jnp.int32)
    t = (pos - i1.astype(jnp.float32))[None, :, None]
    i0 = jnp.maximum(i1 - 1, 0)
    i2 = jnp.minimum(i1 + 1, in_len - 1)
    i3 = jnp.minimum(i1 + 2, in_len - 1)
    p0 = jnp.take(x, i0, axis=1)
    p1 = jnp.take(x, i1, axis=1)
    p2 = jnp.take(x, i2, axis=1)
    p3 = jnp.take(x, i3, axis=1)
    a = 2.0 * p1
    b = p2 - p0
    c = 2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3
    d = -p0 + 3.0 * p1 - 3.0 * p2 + p3
    return 0.5 * (a + b * t + c * t * t + d * t * t * t)


def overlap_add_upsample(
    x: jnp.ndarray, window_size: int, hop_length: int
) -> jnp.ndarray:
    """Hann overlap-add upsampling of frame-rate signals (B, T, C).

    Each frame value becomes a Hann grain of ``window_size`` samples
    hopped by ``hop_length``; grains are summed (reference
    ``data/utils/upsampling.py:55-79``). Output length T*hop_length
    (center-cropped from the full OLA buffer).
    """
    b, t, c = x.shape
    win = hann_window(window_size, periodic=False)
    grains = x[:, :, None, :] * win[None, None, :, None]  # (B, T, W, C)
    out_len = window_size + hop_length * (t - 1)
    idx = (
        jnp.arange(t)[:, None] * hop_length + jnp.arange(window_size)[None, :]
    ).reshape(-1)
    out = jnp.zeros((b, out_len, c), dtype=x.dtype)
    out = out.at[:, idx, :].add(grains.reshape(b, t * window_size, c))
    target = t * hop_length
    start = (out_len - target) // 2
    return out[:, start : start + target, :]
