"""End-user inference: the timbre-transfer pipeline (the reference's
colab notebook, its de-facto inference API — SURVEY.md §2a #25)."""
from .timbre_transfer import (
    ControlAdjustments,
    adjust_controls,
    extract_features,
    stream_timbre_transfer,
    timbre_transfer,
)

__all__ = [
    "ControlAdjustments",
    "adjust_controls",
    "extract_features",
    "stream_timbre_transfer",
    "timbre_transfer",
]
