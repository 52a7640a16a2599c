"""Checkpoint conversion from the reference's PyTorch Lightning format."""
from .to_torch import (
    params_to_reference_state_dict,
    save_reference_checkpoint,
)
from .from_torch import (
    load_lightning_checkpoint,
    convert_state_dict,
    load_reference_checkpoint,
)

__all__ = [
    "load_lightning_checkpoint",
    "convert_state_dict",
    "load_reference_checkpoint",
    "params_to_reference_state_dict",
    "save_reference_checkpoint",
]
