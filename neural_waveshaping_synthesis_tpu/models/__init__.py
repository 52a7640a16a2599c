"""Model zoo: the NEWT synthesizer and its submodules.

All modules are config dataclasses with pure ``init(key) -> params`` /
``apply(params, ...)`` methods over plain pytrees.
"""
from .modules import (
    ControlModule,
    TimeDistributedMLP,
    TrainableNonlinearity,
    dense_apply,
    dense_init,
    film,
    gru_apply,
    gru_init,
    layer_norm_apply,
    layer_norm_init,
)
from .generators import FIRNoiseSynth, HarmonicOscillator, Reverb
from .newt import NEWT, fast_newt_lookup
from .neural_waveshaping import NeuralWaveshaping

__all__ = [
    "ControlModule",
    "TimeDistributedMLP",
    "TrainableNonlinearity",
    "dense_apply",
    "dense_init",
    "film",
    "gru_apply",
    "gru_init",
    "layer_norm_apply",
    "layer_norm_init",
    "FIRNoiseSynth",
    "HarmonicOscillator",
    "Reverb",
    "NEWT",
    "fast_newt_lookup",
    "NeuralWaveshaping",
]
