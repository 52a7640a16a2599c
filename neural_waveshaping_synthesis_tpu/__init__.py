"""TPU-native neural waveshaping synthesis (NEWT) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ben-hayes/neural-waveshaping-synthesis (ISMIR 2021): control signals
(F0 + loudness at 125 Hz) drive a harmonic exciter shaped by learned
waveshaping nonlinearities with FiLM modulation, mixed with a
time-varying FIR filtered-noise branch and convolved with a learned
reverb impulse response.

Design stance (not a port):
  * channels-last ``(batch, time, channels)`` layout everywhere — the
    128-wide channel dims land on the TPU's 128-lane registers / MXU.
  * functional core: every module is a pair of pure functions
    ``init(key, cfg) -> params`` / ``apply(params, ...) -> out`` over
    plain pytrees; explicit PRNG keys replace torch's implicit RNG.
  * data/tensor parallel training via ``jax.sharding.Mesh`` + jit;
    gradient reduction rides ICI collectives inserted by GSPMD.
  * Pallas kernels for the fused audio-rate inner loops.
  * streaming synthesis with explicitly carried state (GRU hidden,
    oscillator phase, iSTFT overlap tail, partitioned-reverb tail) —
    a capability the reference only faked statelessly.
"""

__version__ = "0.1.0"


def _apply_platform_override() -> None:
    """Honor NWS_TPU_PLATFORM=cpu|tpu|axon: some environments pin
    JAX_PLATFORMS at a level the env var can't override after plugin
    registration, so CLIs/tests use this package-level hook instead."""
    import os

    platform = os.environ.get("NWS_TPU_PLATFORM")
    if not platform:
        return
    try:
        import jax

        jax.config.update("jax_platforms", platform)
    except Exception:  # pragma: no cover
        pass


_apply_platform_override()


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (the remote TPU compile
    service in this environment takes seconds-to-minutes per program;
    the cache makes every CLI after the first start instantly).
    Opt out with NWS_TPU_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("NWS_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "NWS_TPU_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".nws_tpu_jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()
