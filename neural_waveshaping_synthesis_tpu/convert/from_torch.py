"""One-shot converter: reference PyTorch Lightning ``.ckpt`` -> JAX pytree.

The reference ships pretrained checkpoints for three URMP instruments
(``checkpoints/nws/{vn,fl,tpt}``, 52 tensors / 267,404 elements each —
SURVEY.md §2a #27). This module loads them WITHOUT pytorch_lightning
installed (a stub meta-path finder satisfies the pickle's class
references) and name-maps every tensor into this framework's
channels-last parameter layout:

  torch layout                         ours
  ------------------------------------------------------------------
  Conv1d(k=1) weight (out, in, 1)      dense w (in, out)      [transpose]
  GRU weight_ih_l0 (3H, in)            gru w_ih (in, 3H)      [transpose]
  grouped Conv1d (C*W_out, W_in, 1)    (C, W_in, W_out)       [reshape+transpose]
  LayerNorm weight/bias (C,)           scale/bias (C,)        [copy]
  reverb.ir (1, N)                     ir (N,)                [squeeze]

Buffers (osc.harmonic_axis, osc.rand_phase, noise_synth.window,
reverb.initial_zero) are recomputed, not stored.
"""
import importlib.abc
import importlib.machinery
import sys
import types
from typing import Dict, Optional, Tuple

import numpy as np


class _StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        mod = types.ModuleType(spec.name)
        mod.__path__ = []

        def getattr_(attr, _name=spec.name):
            return type(attr, (dict,), {"__module__": _name})

        mod.__getattr__ = getattr_
        return mod

    def exec_module(self, module):
        pass


class _StubFinder(importlib.abc.MetaPathFinder):
    """Satisfies pickle references to pytorch_lightning.* container
    classes (AttributeDict etc.) with dict subclasses."""

    def find_spec(self, name, path=None, target=None):
        if name == "pytorch_lightning" or name.startswith("pytorch_lightning."):
            return importlib.machinery.ModuleSpec(name, _StubLoader())
        return None


def load_lightning_checkpoint(path: str) -> Dict:
    """Load a PL checkpoint file into a plain dict of numpy arrays."""
    import torch

    try:
        import pytorch_lightning  # noqa: F401
    except ImportError:
        if not any(isinstance(f, _StubFinder) for f in sys.meta_path):
            sys.meta_path.insert(0, _StubFinder())

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = {k: v.detach().numpy() for k, v in ckpt["state_dict"].items()}
    hparams = dict(ckpt.get("hyper_parameters") or {})
    return {
        "state_dict": state,
        "hyper_parameters": hparams,
        "epoch": ckpt.get("epoch"),
        "global_step": ckpt.get("global_step"),
    }


def _dense(sd, prefix):
    """torch Conv1d(k=1) (out, in, 1) -> {w: (in, out), b: (out,)}."""
    w = sd[f"{prefix}.weight"]
    return {"w": w[:, :, 0].T.copy(), "b": sd[f"{prefix}.bias"].copy()}


def _layer_norm(sd, prefix):
    return {
        "scale": sd[f"{prefix}.weight"].copy(),
        "bias": sd[f"{prefix}.bias"].copy(),
    }


def _td_mlp(sd, prefix, depth):
    """TimeDistributedMLP: torch Sequential indices 0,3,6,... are convs;
    1,4,7,... are TimeDistributedLayerNorm (dynamic.py:25-37)."""
    layers = []
    for i in range(depth):
        conv_idx = i * 3
        layer = {"dense": _dense(sd, f"{prefix}.net.{conv_idx}")}
        if i < depth - 1:
            layer["norm"] = _layer_norm(sd, f"{prefix}.net.{conv_idx + 1}.layer_norm")
        layers.append(layer)
    return {"layers": layers}


def _grouped_shaper(sd, prefix, channels, width, depth):
    """TrainableNonlinearity: grouped Conv1d weights (C*W_out, W_in, 1)
    where output channel o belongs to group o // W_out -> (C, W_in, W_out)."""
    params = {"input_scale": sd[f"{prefix}.input_scale"][0, :, 0].copy()}
    layers = []
    for i in range(depth):
        seq_idx = i * 2  # conv, act, conv, act, ...
        w = sd[f"{prefix}.net.{seq_idx}.weight"]  # (C*W_out, W_in, 1)
        b = sd[f"{prefix}.net.{seq_idx}.bias"]  # (C*W_out,)
        w_out = w.shape[0] // channels
        w_in = w.shape[1]
        layers.append(
            {
                # (C*W_out, W_in) -> (C, W_out, W_in) -> (C, W_in, W_out)
                "w": w[:, :, 0].reshape(channels, w_out, w_in).transpose(0, 2, 1).copy(),
                "b": b.reshape(channels, w_out).copy(),
            }
        )
    params["layers"] = layers
    return params


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    n_waveshapers: int = 64,
    shaping_fn_size: int = 8,
    shaping_fn_depth: int = 4,
    mlp_depth: int = 4,
) -> Dict:
    """Reference state_dict (52 tensors, names as in SURVEY.md §2a #27)
    -> this framework's parameter pytree."""
    params = {
        "embedding": {
            "gru": {
                "w_ih": sd["embedding.gru.weight_ih_l0"].T.copy(),
                "w_hh": sd["embedding.gru.weight_hh_l0"].T.copy(),
                "b_ih": sd["embedding.gru.bias_ih_l0"].copy(),
                "b_hh": sd["embedding.gru.bias_hh_l0"].copy(),
            },
            "proj": _dense(sd, "embedding.proj"),
        },
        "harmonic_mixer": _dense(sd, "harmonic_mixer"),
        "newt": {
            "mlp": _td_mlp(sd, "newt.mlp", mlp_depth),
            "shaping_fn": _grouped_shaper(
                sd, "newt.shaping_fn", n_waveshapers, shaping_fn_size, shaping_fn_depth
            ),
            "mixer": _dense(sd, "newt.mixer.0"),
        },
        "h_generator": _td_mlp(sd, "h_generator", mlp_depth),
        "reverb": {"ir": sd["reverb.ir"][0].copy()},
    }
    return params


def load_reference_checkpoint(
    ckpt_path: str, stats_dir: Optional[str] = None
) -> Tuple[Dict, Dict, Optional[np.ndarray], Optional[np.ndarray]]:
    """Load + convert a reference checkpoint.

    Returns (params pytree, hparams dict, data_mean, data_std); the
    normalization stats are read from ``data_mean.npy`` / ``data_std.npy``
    next to the checkpoint (or ``stats_dir``), mirroring how the
    reference distributes them (SURVEY.md §5 checkpoint/resume).
    """
    import os

    ckpt = load_lightning_checkpoint(ckpt_path)
    params = convert_state_dict(ckpt["state_dict"])
    hparams = ckpt["hyper_parameters"]

    stats_dir = stats_dir or os.path.dirname(ckpt_path)
    mean_path = os.path.join(stats_dir, "data_mean.npy")
    std_path = os.path.join(stats_dir, "data_std.npy")
    data_mean = np.load(mean_path) if os.path.exists(mean_path) else None
    data_std = np.load(std_path) if os.path.exists(std_path) else None
    return params, hparams, data_mean, data_std
