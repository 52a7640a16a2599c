"""Profiling / debugging hooks (SURVEY.md §5: the reference has only
wall-clock timing; here tracing and NaN detection are first-class)."""
import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when log_dir is falsy.

    View with TensorBoard's profile plugin or xprof."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield
    print(f"[profiling] trace written to {log_dir}")


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Enable jax_debug_nans inside the scope (functional-purity makes
    this the TPU answer to the reference's nondeterminism concerns)."""
    import jax

    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class StageTimer:
    """Named wall-clock stage timing (the reference's time.time() style,
    structured)."""

    def __init__(self):
        self.stages = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.3f}s" for k, v in self.stages.items())
