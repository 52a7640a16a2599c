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

    Semantics identity (hop even): output sample s has source position
    pos = (s+0.5)/hop - 0.5, clipped to [0, T-1]. Segment m covers
    s in [m*hop + hop/2, (m+1)*hop + hop/2) and ramps x[m] -> x[m+1]
    with weights (r+0.5)/hop; the first hop/2 samples clip to x[0] and
    the tail past (T-1)*hop + hop/2 clips to x[T-1] (which the final
    segment's x[T-1] -> x[T-1] ramp reproduces exactly).

    Why not the obvious take()-based form: its BACKWARD is a scatter-add
    over out_len rows, which executes catastrophically on TPU (~330 ms
    per training step measured — 600x the rest of the step combined).
    This form is reshape+broadcast; its backward is a dense reduction.
    """
    b, t, c = x.shape
    half = hop // 2
    hi = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)  # x[m+1], edge-clamped
    w = ((jnp.arange(hop, dtype=x.dtype) + 0.5) / hop)[None, None, :, None]
    mid = x[:, :, None, :] * (1.0 - w) + hi[:, :, None, :] * w  # (B, T, hop, C)
    mid = mid.reshape(b, t * hop, c)
    head = jnp.broadcast_to(x[:, :1, :], (b, half, c))
    return jnp.concatenate([head, mid[:, : t * hop - half, :]], axis=1)


def linear_upsample(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Linear interpolation along axis 1 of (B, T, C) -> (B, out_len, C)."""
    in_len = x.shape[1]
    if out_len % in_len == 0 and (out_len // in_len) % 2 == 0:
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
