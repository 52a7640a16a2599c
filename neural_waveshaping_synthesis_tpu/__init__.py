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
