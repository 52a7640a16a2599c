"""Reverse converter: this framework's params -> reference-format
checkpoint, so models trained here load in the PyTorch reference
(the other half of checkpoint interchange; from_torch.py is the
import direction).

Produces the exact 52-tensor state_dict naming of the reference's
``NeuralWaveshaping`` (SURVEY.md §2a #27), including the recomputed
non-learnable buffers (harmonic_axis, rand_phase, window, initial_zero),
wrapped in a minimal PL-style checkpoint dict.
"""
import math
from typing import Dict, Optional

import numpy as np


def _conv1d(prefix: str, dense: Dict, out: Dict) -> None:
    """dense {w: (in, out), b: (out,)} -> torch Conv1d (out, in, 1)."""
    out[f"{prefix}.weight"] = np.ascontiguousarray(dense["w"].T)[:, :, None]
    out[f"{prefix}.bias"] = np.asarray(dense["b"])


def _layer_norm(prefix: str, norm: Dict, out: Dict) -> None:
    out[f"{prefix}.weight"] = np.asarray(norm["scale"])
    out[f"{prefix}.bias"] = np.asarray(norm["bias"])


def _td_mlp(prefix: str, mlp: Dict, out: Dict) -> None:
    depth = len(mlp["layers"])
    for i, layer in enumerate(mlp["layers"]):
        conv_idx = i * 3
        _conv1d(f"{prefix}.net.{conv_idx}", layer["dense"], out)
        if i < depth - 1:
            _layer_norm(f"{prefix}.net.{conv_idx + 1}.layer_norm", layer["norm"], out)


def _grouped_shaper(prefix: str, shaper: Dict, out: Dict) -> None:
    """(C, W_in, W_out) planes -> grouped Conv1d (C*W_out, W_in, 1)."""
    out[f"{prefix}.input_scale"] = np.asarray(shaper["input_scale"])[None, :, None]
    for i, layer in enumerate(shaper["layers"]):
        w = np.asarray(layer["w"])  # (C, W_in, W_out)
        b = np.asarray(layer["b"])  # (C, W_out)
        c, w_in, w_out = w.shape
        out[f"{prefix}.net.{i * 2}.weight"] = np.ascontiguousarray(
            w.transpose(0, 2, 1).reshape(c * w_out, w_in)
        )[:, :, None]
        out[f"{prefix}.net.{i * 2}.bias"] = b.reshape(c * w_out)


def params_to_reference_state_dict(
    params: Dict,
    n_harmonics: int = 101,
    ir_window: int = 256,
) -> Dict[str, np.ndarray]:
    """Parameter pytree -> reference state_dict (numpy values)."""
    params = {
        k: v for k, v in params.items()
    }
    sd: Dict[str, np.ndarray] = {}

    gru = params["embedding"]["gru"]
    sd["embedding.gru.weight_ih_l0"] = np.ascontiguousarray(np.asarray(gru["w_ih"]).T)
    sd["embedding.gru.weight_hh_l0"] = np.ascontiguousarray(np.asarray(gru["w_hh"]).T)
    sd["embedding.gru.bias_ih_l0"] = np.asarray(gru["b_ih"])
    sd["embedding.gru.bias_hh_l0"] = np.asarray(gru["b_hh"])
    _conv1d("embedding.proj", params["embedding"]["proj"], sd)

    # buffers (recomputed, reference generators.py:44-46)
    sd["osc.harmonic_axis"] = np.arange(1, n_harmonics + 1, dtype=np.int64)[
        None, :, None
    ]
    sd["osc.rand_phase"] = np.full((1, n_harmonics, 1), math.tau, np.float32)

    _conv1d("harmonic_mixer", params["harmonic_mixer"], sd)
    _td_mlp("newt.mlp", params["newt"]["mlp"], sd)
    _grouped_shaper("newt.shaping_fn", params["newt"]["shaping_fn"], sd)
    _conv1d("newt.mixer.0", params["newt"]["mixer"], sd)
    _td_mlp("h_generator", params["h_generator"], sd)

    # hann window buffer (torch.hann_window periodic default)
    k = np.arange(ir_window)
    sd["noise_synth.window"] = (
        0.5 - 0.5 * np.cos(2.0 * np.pi * k / ir_window)
    ).astype(np.float32)

    sd["reverb.ir"] = np.asarray(params["reverb"]["ir"])[None, :]
    sd["reverb.initial_zero"] = np.zeros((1, 1), np.float32)
    return sd


def save_reference_checkpoint(
    params: Dict,
    path: str,
    hparams: Optional[Dict] = None,
    step: int = 0,
    epoch: int = 0,
) -> None:
    """Write a reference-loadable ``.ckpt`` (PL dict format, plain
    pickleable containers only — no pytorch_lightning required on
    either side)."""
    import torch

    sd = params_to_reference_state_dict(params)
    ckpt = {
        "state_dict": {k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
        "hyper_parameters": hparams
        or {
            "n_waveshapers": 64,
            "control_hop": 128,
            "sample_rate": 16000,
            "learning_rate": 0.001,
            "lr_decay": 0.9,
            "lr_decay_interval": 10000,
        },
        "epoch": epoch,
        "global_step": step,
        "pytorch-lightning_version": "1.1.2",
    }
    torch.save(ckpt, path)
