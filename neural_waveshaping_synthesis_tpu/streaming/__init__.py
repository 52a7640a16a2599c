"""Streaming (buffer-by-buffer) synthesis with explicitly carried state.

The reference only fakes streaming: ``scripts/time_buffer_sizes.py``
times independent stateless forwards per buffer, so consecutive buffers
have discontinuous GRU state, oscillator phase, noise overlap, and no
reverb tail at all (SURVEY.md §2a #24). This subsystem is the real
thing — a deliberate capability upgrade named in BASELINE.json."""
from .pipeline import PipelinedStreamer
from .synth import StreamingSynth, StreamState

__all__ = ["PipelinedStreamer", "StreamingSynth", "StreamState"]
