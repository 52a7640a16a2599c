"""Small framework utilities (reference: neural_waveshaping_synthesis/utils)."""
from .utils import (
    apply,
    apply_unpack,
    make_dir_if_not_exists,
    seed_all,
    unzip,
    write_wav,
)
from .profiling import StageTimer, debug_nans, trace

__all__ = [
    "apply",
    "apply_unpack",
    "unzip",
    "make_dir_if_not_exists",
    "seed_all",
    "write_wav",
    "StageTimer",
    "debug_nans",
    "trace",
]
