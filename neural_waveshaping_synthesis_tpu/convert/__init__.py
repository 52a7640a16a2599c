"""Checkpoint conversion from the reference's PyTorch Lightning format."""
from .from_torch import (
    load_lightning_checkpoint,
    convert_state_dict,
    load_reference_checkpoint,
)

__all__ = [
    "load_lightning_checkpoint",
    "convert_state_dict",
    "load_reference_checkpoint",
]
