"""Pipelined (multi-buffered) streaming driver.

The serial streaming loop (dispatch buffer k -> fetch buffer k ->
dispatch k+1 ...) pays the full host<->device round-trip once per
buffer. On a tunneled TPU runtime that RTT is a flat ~28 ms — 40x the
~0.7 ms device step @1024-sample buffers — so end-to-end per-buffer
latency is latency-bound, not compute-bound.

This driver exploits JAX's async dispatch: ``step`` returns as soon as
the work is *enqueued*, and ``copy_to_host_async()`` starts the
device->host transfer without blocking. By dispatching buffer
``k + depth`` before fetching buffer ``k``, the RTTs of up to ``depth``
buffers overlap each other and the device compute, so steady-state
per-buffer *cadence* approaches max(device step time, link throughput)
instead of the round-trip latency. The price is ``depth`` buffers of
added output latency — exactly the classic double/triple-buffering
trade every audio callback API makes.

Reference context: ``/root/reference/scripts/time_buffer_sizes.py``
times stateless forwards with a blocking fetch per buffer (the serial
pattern). This subsystem is a capability upgrade over that; the serial
numbers remain reported alongside (docs/results/streaming/).

Semantics: the pipeline changes *when* samples arrive on the host, not
*what* they are — outputs are bit-identical to the serial loop (see
tests/test_streaming.py::test_pipelined_matches_serial).
"""
from collections import deque
from typing import Deque, Iterator, Optional

import jax
import numpy as np

from .synth import StreamingSynth


class PipelinedStreamer:
    """Depth-``depth`` multi-buffered wrapper around ``StreamingSynth``.

    Usage::

        streamer = PipelinedStreamer(synth, params, batch=1, key=key,
                                     depth=4)
        for f0, control in control_stream:
            audio = streamer.push(f0, control)   # None while priming
            if audio is not None:
                play(audio)                      # buffer from `depth` pushes ago
        for audio in streamer.flush():
            play(audio)

    ``push`` dispatches the step and starts an async device->host copy,
    then (once the pipeline is full) returns the oldest in-flight
    buffer as a host ndarray; the blocking wait for that buffer has
    been overlapped with the ``depth`` younger dispatches.
    """

    def __init__(
        self,
        synth: StreamingSynth,
        params,
        batch: int,
        key: jax.Array,
        depth: int = 4,
        jit_step=None,
    ):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self.synth = synth
        self.params = params
        self.depth = depth
        self.ir_spectra = synth.ir_partition_spectra(params)
        self.state = synth.init_state(params, batch, key)
        # No donation: with buffers in flight the runtime may still be
        # reading the previous state when the next step is dispatched.
        # (jit would raise on a donated-but-alive buffer anyway; being
        # explicit keeps the failure mode out of the hot path.)
        self._step = jit_step if jit_step is not None else jax.jit(synth.step)
        self._inflight: Deque[jax.Array] = deque()

    def __len__(self) -> int:
        return len(self._inflight)

    def push(self, f0, control) -> Optional[np.ndarray]:
        """Dispatch one buffer; return the buffer from ``depth`` pushes
        ago as a host array, or None while the pipeline is priming."""
        audio, self.state = self._step(
            self.params, self.state, f0, control, self.ir_spectra
        )
        # Start the device->host transfer immediately so it rides the
        # link while younger buffers are still being dispatched/computed.
        try:
            audio.copy_to_host_async()
        except (AttributeError, RuntimeError):  # pragma: no cover
            pass  # fetch in pop() still works, just unoverlapped
        self._inflight.append(audio)
        if len(self._inflight) > self.depth:
            return self.pop()
        return None

    def pop(self) -> np.ndarray:
        """Block for the oldest in-flight buffer (host ndarray)."""
        if not self._inflight:
            raise IndexError("pop from an empty pipeline")
        return np.asarray(self._inflight.popleft())

    def flush(self) -> Iterator[np.ndarray]:
        """Drain remaining in-flight buffers (end of stream)."""
        while self._inflight:
            yield self.pop()
