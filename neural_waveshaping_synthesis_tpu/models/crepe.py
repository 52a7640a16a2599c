"""CREPE pitch estimator in JAX (the reference's primary F0 extractor).

The reference calls torchcrepe 0.0.12 (``data/utils/f0_extraction.py:16-57``:
full model, hop 128, fmin 50 / fmax 2000, Viterbi decoding, harmonicity
as confidence). This module rebuilds that capability TPU-native:

  * the CREPE CNN (Kim et al. 2018) at 'full' (capacity 32x, ~22M params)
    and 'tiny' (4x) sizes as channels-last 1-D convolutions;
  * per-window normalization and centered zero-padded framing identical
    to torchcrepe's preprocess (window 1024, arbitrary hop);
  * frames are processed in ONE batched XLA program — the reference's
    hot loop (SURVEY.md §3.2) ran CREPE window-batches through torch on
    a single device; here every window of a file (bucketed to bound
    recompiles) is a row of a single conv batch;
  * band-limited Viterbi decoding over the 360-bin posteriorgram as a
    forward `lax.scan` of max-plus products with backtrace, plus
    CREPE's local-weighted-average cents refinement;
  * periodicity = posterior probability at the decoded bin.

Pretrained weights: convert a torchcrepe ``.pth`` state dict with
``convert_torchcrepe_state_dict`` (torchcrepe ships ``full.pth`` /
``tiny.pth``; this environment has no network, so conversion runs
whenever the user provides the file — random-init is used otherwise and
exercised by tests for shape/decode correctness).
"""
import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

WINDOW_SIZE = 1024
N_BINS = 360
CENTS_PER_BIN = 20.0
CENTS_OFFSET = 1997.3794084376191


def bins_to_cents(bins):
    return CENTS_PER_BIN * bins + CENTS_OFFSET


def cents_to_frequency(cents):
    return 10.0 * 2.0 ** (cents / 1200.0)


def frequency_to_bins(freq):
    cents = 1200.0 * jnp.log2(freq / 10.0)
    return (cents - CENTS_OFFSET) / CENTS_PER_BIN


# capacity multipliers per CREPE size: filters = mult * [32, 4, 4, 4, 8, 16]
_CAPACITIES = {"full": 32, "large": 24, "medium": 16, "small": 8, "tiny": 4}
_BASE_FILTERS = (32, 4, 4, 4, 8, 16)
_WIDTHS = (512, 64, 64, 64, 64, 64)
_STRIDES = (4, 1, 1, 1, 1, 1)
# keras 'same' padding for the given widths/strides at input length 1024
_PADS = ((254, 254), (31, 32), (31, 32), (31, 32), (31, 32), (31, 32))
_BN_EPS = 1e-3  # keras BatchNormalization epsilon, kept by torchcrepe


@dataclass(frozen=True)
class Crepe:
    """CREPE CNN config. ``apply`` maps normalized 1024-sample windows to
    360 sigmoid pitch-bin probabilities."""

    capacity: str = "full"

    @property
    def filters(self) -> Tuple[int, ...]:
        mult = _CAPACITIES[self.capacity]
        return tuple(mult * f for f in _BASE_FILTERS)

    def init(self, key) -> Dict:
        keys = jax.random.split(key, 7)
        layers = []
        in_ch = 1
        for i, out_ch in enumerate(self.filters):
            w_key, b_key = jax.random.split(keys[i])
            fan_in = in_ch * _WIDTHS[i]
            bound = 1.0 / math.sqrt(fan_in)
            layers.append(
                {
                    "w": jax.random.uniform(
                        w_key, (_WIDTHS[i], in_ch, out_ch), jnp.float32, -bound, bound
                    ),
                    "b": jax.random.uniform(
                        b_key, (out_ch,), jnp.float32, -bound, bound
                    ),
                    "bn_scale": jnp.ones((out_ch,)),
                    "bn_bias": jnp.zeros((out_ch,)),
                    "bn_mean": jnp.zeros((out_ch,)),
                    "bn_var": jnp.ones((out_ch,)),
                }
            )
            in_ch = out_ch
        k_w, k_b = jax.random.split(keys[6])
        feat = 4 * self.filters[-1]
        bound = 1.0 / math.sqrt(feat)
        classifier = {
            "w": jax.random.uniform(k_w, (feat, N_BINS), jnp.float32, -bound, bound),
            "b": jax.random.uniform(k_b, (N_BINS,), jnp.float32, -bound, bound),
        }
        return {"layers": layers, "classifier": classifier}

    def apply(self, params: Dict, windows: jnp.ndarray) -> jnp.ndarray:
        """(B, 1024) normalized windows -> (B, 360) bin probabilities."""
        x = windows[..., None]  # (B, W, C=1)
        for i, layer in enumerate(params["layers"]):
            x = jax.lax.conv_general_dilated(
                x,
                layer["w"],
                window_strides=(_STRIDES[i],),
                padding=[_PADS[i]],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            x = x + layer["b"]
            x = jax.nn.relu(x)
            x = (x - layer["bn_mean"]) * jax.lax.rsqrt(
                layer["bn_var"] + _BN_EPS
            ) * layer["bn_scale"] + layer["bn_bias"]
            # max-pool (2, 1)
            b, w, c = x.shape
            x = x.reshape(b, w // 2, 2, c).max(axis=2)
        # torchcrepe flattens time-major: (B, W=4, C) -> (B, 4*C)
        b = x.shape[0]
        x = x.reshape(b, -1)
        logits = (
            jnp.dot(x, params["classifier"]["w"], preferred_element_type=jnp.float32)
            + params["classifier"]["b"]
        )
        return jax.nn.sigmoid(logits)


# ---------------------------------------------------------------------------
# framing / normalization (torchcrepe preprocess parity)
# ---------------------------------------------------------------------------
def frame_audio(audio: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """(T,) audio -> (1 + T//hop, 1024) centered zero-padded windows,
    per-window mean/std normalized (std floored at 1e-10)."""
    t = audio.shape[-1]
    n_frames = 1 + t // hop_length
    padded = jnp.pad(audio, (WINDOW_SIZE // 2, WINDOW_SIZE // 2))
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(WINDOW_SIZE)[None, :]
    )
    frames = padded[idx]
    mean = frames.mean(axis=-1, keepdims=True)
    std = frames.std(axis=-1, keepdims=True)
    return (frames - mean) / jnp.maximum(std, 1e-10)


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------
def _freq_mask(fmin: float, fmax: float) -> np.ndarray:
    bins = np.arange(N_BINS)
    freqs = cents_to_frequency(bins_to_cents(bins))
    return ((freqs >= fmin) & (freqs <= fmax)).astype(np.float32)


@partial(jax.jit, static_argnames=("window",))
def viterbi_decode(probs: jnp.ndarray, window: int = 12) -> jnp.ndarray:
    """Max-likelihood bin path through a (T, 360) posteriorgram.

    Band-limited transition prior max(window - |i-j|, 0), row-normalized
    (the torchcrepe/librosa construction); uniform initial distribution.
    Forward max-plus recursion as a lax.scan carrying per-frame argmax
    pointers, then a reverse scan backtracks the path.
    """
    diff = jnp.abs(
        jnp.arange(N_BINS)[:, None] - jnp.arange(N_BINS)[None, :]
    ).astype(jnp.float32)
    transition = jnp.maximum(window - diff, 0.0)
    log_trans = jnp.log(transition / transition.sum(axis=1, keepdims=True) + 1e-20)

    obs = probs / jnp.maximum(probs.sum(axis=-1, keepdims=True), 1e-12)
    log_obs = jnp.log(obs + 1e-20)

    def forward(delta, log_o):
        # scores[i, j] = delta[i] + log_trans[i, j]
        scores = delta[:, None] + log_trans
        ptr = jnp.argmax(scores, axis=0)  # (360,) best predecessor per state
        delta_new = jnp.max(scores, axis=0) + log_o
        return delta_new, ptr

    init = log_obs[0] - jnp.log(float(N_BINS))
    delta_final, ptrs = jax.lax.scan(forward, init, log_obs[1:])

    last = jnp.argmax(delta_final)

    def backward(state, ptr):
        # ptr[j] = best predecessor of state j at the NEXT step, so the
        # emitted value must be the PREDECESSOR (state at this step) —
        # emitting `state` here shifts the whole path by one frame.
        prev = ptr[state]
        return prev, prev

    _, path_head = jax.lax.scan(backward, last, ptrs, reverse=True)
    return jnp.concatenate([path_head, jnp.array([last])])


def argmax_decode(probs: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(probs, axis=-1)


@jax.jit
def local_average_cents(probs: jnp.ndarray, bins: jnp.ndarray) -> jnp.ndarray:
    """CREPE's sub-bin refinement: probability-weighted average of cents
    over a +-4-bin neighborhood of the decoded bin."""
    offsets = jnp.arange(-4, 5)
    idx = jnp.clip(bins[:, None] + offsets[None, :], 0, N_BINS - 1)
    w = jnp.take_along_axis(probs, idx, axis=-1)
    cents = bins_to_cents(idx.astype(jnp.float32))
    return (w * cents).sum(-1) / jnp.maximum(w.sum(-1), 1e-12)


# ---------------------------------------------------------------------------
# top-level predict
# ---------------------------------------------------------------------------
def predict(
    model: Crepe,
    params: Dict,
    audio: np.ndarray,
    sample_rate: float = 16000,
    hop_length: int = 128,
    fmin: float = 50.0,
    fmax: float = 2000.0,
    batch_size: int = 2048,
    decoder: str = "viterbi",
    frame_bucket: int = 512,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pitch-track a mono 16 kHz signal.

    Returns (f0_hz, periodicity), each (1 + len(audio)//hop,). Audio at
    other sample rates must be resampled to 16 kHz first (CREPE is
    trained at 16 kHz), matching torchcrepe.predict's contract.

    ``frame_bucket`` pads the frame count up to a multiple so XLA
    compiles one program per bucket size instead of one per file length.
    """
    assert sample_rate == 16000, "CREPE operates at 16 kHz; resample first"
    n_frames = 1 + len(audio) // hop_length
    frames = frame_audio(jnp.asarray(audio, jnp.float32), hop_length)

    padded_frames = -(-n_frames // frame_bucket) * frame_bucket
    frames = jnp.pad(frames, ((0, padded_frames - n_frames), (0, 0)))

    mask = jnp.asarray(_freq_mask(fmin, fmax))
    apply_fn = jax.jit(lambda p, x: model.apply(p, x) * mask)

    prob_chunks = []
    for start in range(0, padded_frames, batch_size):
        prob_chunks.append(apply_fn(params, frames[start : start + batch_size]))
    probs = jnp.concatenate(prob_chunks)[:n_frames]

    if decoder == "viterbi":
        bins = viterbi_decode(probs)
    elif decoder == "argmax":
        bins = argmax_decode(probs)
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    cents = local_average_cents(probs, bins)
    f0 = cents_to_frequency(cents)
    periodicity = jnp.take_along_axis(probs, bins[:, None], axis=-1)[:, 0]
    return np.asarray(f0), np.asarray(periodicity)


# ---------------------------------------------------------------------------
# torchcrepe weight conversion
# ---------------------------------------------------------------------------
def convert_torchcrepe_state_dict(sd) -> Dict:
    """torchcrepe model state dict (conv1..conv6[, _BN], classifier) ->
    this module's parameter pytree.

    torchcrepe Conv2d weights are (out, in, width, 1) -> ours (width, in,
    out); the classifier's 2048 inputs are time-major in both layouts
    (torchcrepe permutes (B, C, W, 1) -> (B, W, C) before flattening).
    """
    import numpy as _np

    def arr(v):
        return _np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    layers = []
    for i in range(1, 7):
        layers.append(
            {
                "w": arr(sd[f"conv{i}.weight"])[:, :, :, 0].transpose(2, 1, 0),
                "b": arr(sd[f"conv{i}.bias"]),
                "bn_scale": arr(sd[f"conv{i}_BN.weight"]),
                "bn_bias": arr(sd[f"conv{i}_BN.bias"]),
                "bn_mean": arr(sd[f"conv{i}_BN.running_mean"]),
                "bn_var": arr(sd[f"conv{i}_BN.running_var"]),
            }
        )
    classifier = {
        "w": arr(sd["classifier.weight"]).T,
        "b": arr(sd["classifier.bias"]),
    }
    return {"layers": layers, "classifier": classifier}


def save_params_npz(params: Dict, path: str) -> None:
    """Cache a converted CREPE parameter pytree as a flat .npz (no torch
    needed to reload; see scripts/convert_crepe.py)."""
    import numpy as _np

    flat = {}
    for i, layer in enumerate(params["layers"]):
        for k, v in layer.items():
            flat[f"layers/{i}/{k}"] = _np.asarray(v)
    for k, v in params["classifier"].items():
        flat[f"classifier/{k}"] = _np.asarray(v)
    _np.savez(path, **flat)


def load_params_npz(path: str) -> Dict:
    """Load a pytree cached by :func:`save_params_npz`."""
    import numpy as _np

    with _np.load(path) as z:
        n_layers = 1 + max(
            int(k.split("/")[1]) for k in z.files if k.startswith("layers/")
        )
        layers = [
            {
                k.split("/")[2]: z[k]
                for k in z.files
                if k.startswith(f"layers/{i}/")
            }
            for i in range(n_layers)
        ]
        classifier = {
            k.split("/")[1]: z[k] for k in z.files if k.startswith("classifier/")
        }
    return {"layers": layers, "classifier": classifier}


def load_torchcrepe_weights(path: str) -> Dict:
    """Load CREPE weights: a torchcrepe ``full.pth`` / ``tiny.pth``
    state dict (converted on the fly) or an ``.npz`` pytree cached by
    ``scripts/convert_crepe.py`` (no torch dependency at load time)."""
    if path.endswith(".npz"):
        return load_params_npz(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torchcrepe_state_dict(sd)
