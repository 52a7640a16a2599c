"""Core learned modules as pure init/apply pairs over parameter pytrees.

Capability-parity targets (reference file:line):
  * FiLM                   — models/modules/dynamic.py:6-8
  * TimeDistributedMLP     — models/modules/dynamic.py:20-40 (1x1 Conv1d
    stacks == per-timestep dense layers; per-timestep LayerNorm; LeakyReLU)
  * TrainableNonlinearity  — models/modules/shaping.py:15-37 (64 independent
    scalar waveshapers as grouped 1x1 convs == per-channel tiny MLPs)
  * ControlModule          — models/neural_waveshaping.py:18-26 (GRU + 1x1 proj)

TPU-first design decisions:
  * channels-last (B, T, C): C=128 rides the 128-lane axis; the dense
    layers are (B*T, C) x (C, C') matmuls that tile the MXU perfectly.
  * grouped 1x1 convs become broadcast/einsum ops over a (C, W_in, W_out)
    weight tensor — elementwise VPU work, no im2col, no groups machinery.
  * the GRU is a `lax.scan` over the cheap 125 Hz control rate with the
    three gate matmuls fused into one (B, in)x(in, 3H) MXU op per step,
    torch gate order (r, z, n) preserved for checkpoint parity.
  * initializers reproduce torch defaults (uniform(+-1/sqrt(fan_in)) for
    conv/linear/GRU) so from-scratch training matches the reference recipe.
"""
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import minigin as gin

Params = Dict


# ---------------------------------------------------------------------------
# initializers (torch-default parity)
# ---------------------------------------------------------------------------
def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def dense_init(key, in_size: int, out_size: int) -> Params:
    """torch nn.Conv1d(k=1)/nn.Linear default init: kaiming-uniform(a=sqrt(5))
    == uniform(+-1/sqrt(fan_in)) for both weight and bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_size)
    return {
        "w": _uniform(kw, (in_size, out_size), bound),
        "b": _uniform(kb, (out_size,), bound),
    }


def _acc_dtype(*args) -> jnp.dtype:
    """Accumulation dtype for MXU dots: at least float32 (the bf16
    mixed-precision contract), but promoted to float64 when any operand
    is f64 — pinning f32 there would re-round f64 math, and the dot
    TRANSPOSE (the weight gradient) contracts over the data-parallel
    batch axis, so f32 partial sums there are reassociated differently
    per mesh size (measured ~1e-6 normalized grad drift that breaks
    fit-level f64 mesh-equivalence)."""
    return jnp.promote_types(jnp.result_type(*(a.dtype for a in args)), jnp.float32)


def dense_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(..., in) -> (..., out); the MXU workhorse.

    Mixed precision contract: the dot accumulates in at least float32
    (preferred_element_type via _acc_dtype; f64 operands accumulate in
    f64); the OUTPUT follows the input dtype, so a bfloat16 activation
    stream stays bfloat16 through dense layers instead of being
    silently promoted (which would re-materialize full-width
    activations and erase the HBM savings)."""
    y = jnp.dot(x, p["w"], preferred_element_type=_acc_dtype(x, p["w"])) + p["b"]
    return y if x.dtype == jnp.float32 else y.astype(x.dtype)


# ---------------------------------------------------------------------------
# FiLM
# ---------------------------------------------------------------------------
def film(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Feature-wise linear modulation: gamma * x + beta."""
    return gamma * x + beta


# ---------------------------------------------------------------------------
# LayerNorm over the channel axis (torch nn.LayerNorm(C) parity)
# ---------------------------------------------------------------------------
def layer_norm_init(size: int) -> Params:
    return {"scale": jnp.ones((size,)), "bias": jnp.zeros((size,))}


def layer_norm_apply(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # statistics always in float32: bf16 mean/variance over the channel
    # axis loses enough mantissa to visibly shift the normalization
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * p["scale"] + p["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# TimeDistributedMLP
# ---------------------------------------------------------------------------
@gin.configurable
@dataclass(frozen=True)
class TimeDistributedMLP:
    """Per-timestep MLP: depth dense layers, LayerNorm + LeakyReLU between.

    depth >= 3 asserted as in the reference (dynamic.py:24).
    """

    in_size: int
    hidden_size: int
    out_size: int
    depth: int = 3

    def __post_init__(self):
        assert self.depth >= 3, "Depth must be at least 3"

    def init(self, key) -> Params:
        keys = jax.random.split(key, self.depth)
        layers = []
        for i in range(self.depth):
            ins = self.in_size if i == 0 else self.hidden_size
            outs = self.hidden_size if i < self.depth - 1 else self.out_size
            layer = {"dense": dense_init(keys[i], ins, outs)}
            if i < self.depth - 1:
                layer["norm"] = layer_norm_init(outs)
            layers.append(layer)
        return {"layers": layers}

    def apply(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, in) -> (B, T, out)."""
        for i, layer in enumerate(p["layers"]):
            x = dense_apply(layer["dense"], x)
            if i < self.depth - 1:
                x = layer_norm_apply(layer["norm"], x)
                x = jax.nn.leaky_relu(x, negative_slope=0.01)
        return x


# ---------------------------------------------------------------------------
# TrainableNonlinearity — the bank of learned scalar waveshapers
# ---------------------------------------------------------------------------
def sine(x):
    """Polynomial sine (ops/fastmath.py): the shaper bank is SINE-bound
    (one jnp.sin pass over the (B·T, C·W) activations costs 3.35 ms at
    256x1024 samples vs 1.76 ms for ALL its matmuls; fast_sin does the
    same pass in 0.72 ms at ≤6e-7 abs error for these arguments — see
    fastmath.py for the bounds and the measurement)."""
    from ..ops.fastmath import fast_sin

    return fast_sin(x)


def sine_exact(x):
    return jnp.sin(x)


@gin.configurable
@dataclass(frozen=True)
class TrainableNonlinearity:
    """C independent scalar shaping functions, each a width-W MLP 1->W->..->1.

    Parameter layout (vs the reference's grouped Conv1d weights of shape
    (C*W, W, 1)): per-layer tensors of shape (C, W_in, W_out) so that
    apply() is a chain of broadcasted multiply-accumulates over the
    (B, T, C, W) activation — pure VPU work, fully vectorized over the
    lane (C) and sublane (T) axes. `input_scale` init randn*10 matches
    shaping.py:21.
    """

    channels: int
    width: int
    depth: int = 3
    nonlinearity: str = "sine"
    final_nonlinearity: str = "sine"
    # "einsum": contraction via dot_general (see apply docstring).
    # "unrolled": the same math as W separate (B, T, C) broadcast
    # planes — no dot_general anywhere, so XLA can fuse the whole bank
    # (mul/add/polynomial-sine chains) into loop fusions instead of
    # materializing the (B, T, C, W) activation at each layer boundary.
    formulation: str = "einsum"

    def _act(self, name):
        return {"sine": sine, "sine_exact": sine_exact,
                "relu": jax.nn.relu}[name]

    def init(self, key) -> Params:
        keys = jax.random.split(key, self.depth + 1)
        params = {"input_scale": jax.random.normal(keys[0], (self.channels,)) * 10.0}
        layers = []
        for i in range(self.depth):
            w_in = 1 if i == 0 else self.width
            w_out = self.width if i < self.depth - 1 else 1
            kw, kb = jax.random.split(keys[i + 1])
            bound = 1.0 / jnp.sqrt(w_in)
            layers.append(
                {
                    "w": _uniform(kw, (self.channels, w_in, w_out), bound),
                    "b": _uniform(kb, (self.channels, w_out), bound),
                }
            )
        params["layers"] = layers
        return params

    def apply(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, C) -> (B, T, C), each channel through its own scalar MLP.

        Formulation notes (measured on v5e, scan timing): with exact
        jnp.sin this broadcast einsum costs ~24 ms fwd at batch 8 x 4 s
        / ~69 ms fwd+bwd. Component isolation at 256x1024 samples shows
        the bound is SINE COMPUTE — one jnp.sin pass over the
        (B*T, C*W) activations is 3.35 ms while all four matmul layers
        total 1.76 ms. (An earlier note here claimed 262M sines measure
        1.2 ms and blamed HBM; that measurement was invalidated — XLA
        hoisted the loop-invariant sines out of the timing scan. The
        corrected harness perturbs the input by the scan carry.) Hence
        the polynomial `sine` above; `sine_exact` restores jnp.sin.
        Rejected formulations (with exact sin; ratios unchanged by the
        activation choice since all apply the same sine count):
        block-diagonal MXU matmul (85 ms), width-leading wbtc einsum
        (no change), and two fused Pallas kernels (58 / 39.7 ms fwd —
        kernels/newt_fused.py, kept as baselines). Post-fast_sin
        re-A/Bs (2026-08-18, batch 8 probes, einsum = 15.1 ms fwd /
        40.1 fwd+bwd): the Pallas kernel with the polynomial sine
        in-kernel still loses (35.4 / 60.4 — Mosaic half-lane codegen),
        and `formulation="unrolled"` below loses at 50.7 ms fwd (XLA
        materializes each broadcast plane rather than fusing the DAG).
        """
        act = self._act(self.nonlinearity)
        final_act = self._act(self.final_nonlinearity)

        if self.formulation == "unrolled" and self.depth >= 2:
            return self._apply_unrolled(p, x, act, final_act)

        h = (x * p["input_scale"])[..., None]  # (B, T, C, 1)
        for i, layer in enumerate(p["layers"]):
            h = jnp.einsum("btcw,cwv->btcv", h, layer["w"]) + layer["b"]
            h = act(h) if i < self.depth - 1 else final_act(h)
        return h[..., 0]

    def _apply_unrolled(self, p, x, act, final_act):
        """Same values as the einsum path, expressed as W broadcast
        planes of shape (B, T, C) with (C,)-vector weights — a pure
        elementwise DAG (no dot_general), unrolled over the static
        width so XLA's loop fusion can keep inter-layer activations in
        registers instead of round-tripping (B, T, C, W) through HBM."""
        w = self.width
        h = x * p["input_scale"]  # (B, T, C)
        first, *mid, last = p["layers"]
        # 1 -> W
        hs = [
            act(h * first["w"][:, 0, v] + first["b"][:, v]) for v in range(w)
        ]
        # W -> W middle layers
        for layer in mid:
            hs = [
                act(
                    sum(hs[u] * layer["w"][:, u, v] for u in range(w))
                    + layer["b"][:, v]
                )
                for v in range(w)
            ]
        # W -> 1
        out = (
            sum(hs[u] * last["w"][:, u, 0] for u in range(w))
            + last["b"][:, 0]
        )
        return final_act(out)

    def bake_table(
        self, p: Params, table_size: int, table_min: float, table_max: float
    ) -> jnp.ndarray:
        """Sample each channel's shaper on a uniform grid -> (table_size, C).

        The FastNEWT lookup table (shaping.py:107-119), baked with the
        input_scale included (the reference feeds raw grid values into
        shaping_fn, which applies input_scale internally — so do we)."""
        grid = jnp.linspace(table_min, table_max, table_size)  # (S,)
        x = jnp.broadcast_to(grid[None, :, None], (1, table_size, self.channels))
        return self.apply(p, x)[0]  # (S, C)


# ---------------------------------------------------------------------------
# GRU (torch parity) + ControlModule
# ---------------------------------------------------------------------------
def gru_init(key, input_size: int, hidden_size: int) -> Params:
    """torch nn.GRU init: all weights/biases uniform(+-1/sqrt(H)).

    Stored pre-transposed for right-multiplication; gate order (r, z, n)
    along the 3H axis matches torch's weight_ih_l0 row order, so the
    checkpoint converter is a plain transpose."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(hidden_size)
    return {
        "w_ih": _uniform(k1, (input_size, 3 * hidden_size), bound),
        "w_hh": _uniform(k2, (hidden_size, 3 * hidden_size), bound),
        "b_ih": _uniform(k3, (3 * hidden_size,), bound),
        "b_hh": _uniform(k4, (3 * hidden_size,), bound),
    }


def gru_step(
    p: Params, h: jnp.ndarray, x: jnp.ndarray
) -> jnp.ndarray:
    """One torch-semantics GRU step. x (B, in), h (B, H) -> h' (B, H)."""
    hidden = h.shape[-1]
    gi = jnp.dot(x, p["w_ih"], preferred_element_type=_acc_dtype(x, p["w_ih"])) + p["b_ih"]
    gh = jnp.dot(h, p["w_hh"], preferred_element_type=_acc_dtype(h, p["w_hh"])) + p["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _gru_scan_time_major(
    p: Params, x: jnp.ndarray, h0: Optional[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GRU core over (B, T, in) -> (time-major ys (T, B, H), final h).

    lax.scan over the 125 Hz control axis — 500 steps of fused (B, in+H)
    matmuls; the input-side projection for ALL timesteps is hoisted out
    of the scan into ONE MXU matmul, written time-major directly
    (einsum 'bti,ik->tbk') so the scan consumes it without a separate
    (B,T,·)->(T,B,·) transpose copy. Profiling showed those transposes
    execute at ~2 GB/s on TPU (sublane-crossing layout copies,
    ~5 ms/train-step across fwd+bwd); keeping the sequence time-major
    end-to-end and folding both boundary transposes into the adjacent
    projections removes them.
    """
    hidden = p["w_hh"].shape[0]
    b = x.shape[0]
    if h0 is None:
        # carry dtype must match the gate-compute result (x (.) params
        # promotion), not the input: with f64 params and f32 control
        # input (the x64 equivalence tests) an x-dtyped carry breaks the
        # scan; bf16-in/bf16-params still yields a bf16 carry.
        h0 = jnp.zeros(
            (b, hidden), dtype=jnp.result_type(x.dtype, p["w_hh"].dtype)
        )

    gi_all = jnp.einsum(
        "bti,ik->tbk", x, p["w_ih"],
        preferred_element_type=_acc_dtype(x, p["w_ih"]),
    ) + p["b_ih"]

    def step(h, gi):
        gh = jnp.dot(h, p["w_hh"], preferred_element_type=_acc_dtype(h, p["w_hh"])) + p["b_hh"]
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h_final, ys = jax.lax.scan(step, h0, gi_all)
    return ys, h_final


def gru_apply(
    p: Params, x: jnp.ndarray, h0: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan a GRU over (B, T, in) -> ((B, T, H), final h (B, H))."""
    ys, h_final = _gru_scan_time_major(p, x, h0)
    return jnp.swapaxes(ys, 0, 1), h_final


@gin.configurable
@dataclass(frozen=True)
class ControlModule:
    """GRU(control_size -> hidden) + dense projection to the embedding.

    The reference discards GRU state every call (neural_waveshaping.py:25);
    apply() exposes the carry so streaming synthesis can thread it.
    """

    control_size: int = 2
    hidden_size: int = 128
    embedding_size: int = 128

    def init(self, key) -> Params:
        kg, kp = jax.random.split(key)
        return {
            "gru": gru_init(kg, self.control_size, self.hidden_size),
            "proj": dense_init(kp, self.hidden_size, self.embedding_size),
        }

    def apply(
        self, p: Params, control: jnp.ndarray, h0: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, T, control_size) -> ((B, T, E), final GRU state (B, H)).

        The GRU core runs time-major; the back-to-batch-major transpose
        is folded into the projection matmul (einsum 'tbh,he->bte')
        instead of materializing a layout copy between them — same
        contraction, same values, one less ~2 GB/s sublane-crossing
        copy per step (see _gru_scan_time_major)."""
        ys, h_final = _gru_scan_time_major(p["gru"], control, h0)
        w = p["proj"]["w"]
        y = jnp.einsum(
            "tbh,he->bte", ys, w, preferred_element_type=_acc_dtype(ys, w)
        ) + p["proj"]["b"]
        y = y if ys.dtype == jnp.float32 else y.astype(ys.dtype)
        return y, h_final
