"""Small framework utilities (reference: neural_waveshaping_synthesis/utils)."""
from .utils import apply, apply_unpack, unzip, make_dir_if_not_exists, seed_all
from .profiling import StageTimer, debug_nans, trace

__all__ = [
    "apply",
    "apply_unpack",
    "unzip",
    "make_dir_if_not_exists",
    "seed_all",
    "StageTimer",
    "debug_nans",
    "trace",
]
