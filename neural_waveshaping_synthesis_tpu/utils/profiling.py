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


def differential_scan_ms(body, n_short=20, n_long=120, repeats=3,
                         init_carry=None, args=()):
    """Per-iteration device time of ``body``, by differential scan.

    The honest timing primitive on tunneled runtimes (CLAUDE.md rule 1:
    ``block_until_ready`` returns early; a single-scan time carries the
    flat dispatch RTT). Runs ``body(carry) -> carry`` for n_short and
    n_long iterations inside ONE compiled ``lax.scan`` each, times the
    fetch of the final carry, and reports
    (t_long - t_short) / (n_long - n_short) in ms — the RTT and the
    fetch cost cancel in the difference.

    ``init_carry`` defaults to a float32 scalar; pass any pytree (e.g.
    a streaming state) to thread real state instead. Scalar-carry
    callers must make body's expensive computation depend on the carry
    (e.g. perturb an input by ``carry * 1e-30``) or XLA hoists it out
    of the loop and the measurement is fiction (docs/DESIGN.md §3.2),
    and must fold the result into the returned carry at nonzero scale
    or it is dead code. (A threaded state evolves every iteration, so
    it defeats both traps by construction.) Used by
    scripts/profile_train_step.py and scripts/profile_streaming_step.py.

    ``args``: extra loop-invariant operands, passed as
    ``body(carry, *args)``. Large operands MUST ride here (or in the
    carry) rather than in ``body``'s closure: closed-over arrays are
    baked into the program as constants and shipped with the
    size-limited remote compile request — a few hundred MB of closure
    constants fails compilation outright (HTTP 413).
    """
    import jax
    import jax.numpy as jnp

    if init_carry is None:
        init_carry = jnp.float32(0.0)
    init_carry = jax.device_put(init_carry)
    args = tuple(jax.device_put(a) for a in args)

    def run(n):
        @jax.jit
        def prog(init, *a):
            def step(c, _):
                return body(c, *a), None

            out, _ = jax.lax.scan(step, init, None, length=n)
            return out

        jax.device_get(prog(init_carry, *args))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.device_get(prog(init_carry, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n_long) - run(n_short)) * 1000.0 / (n_long - n_short)
