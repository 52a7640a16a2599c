"""Pallas TPU kernels for hot ops where XLA's lowering is poor.

Honest scoping note: profiling showed XLA already fuses this model's
audio-rate forward to ~1 us/clip at batch 64 (SURVEY.md §2a's [KERNEL]
candidates are all fully fused by the compiler), so most hand kernels
cannot win there. The kernels kept here are the ones with a measured
advantage over the XLA lowering — currently the FastNEWT table lookup,
whose per-channel gather lowers catastrophically in XLA (~90 ms per
4-s clip vs microseconds fused).
"""
from .fast_newt import fast_newt_lookup_pallas, has_pallas_support

__all__ = ["fast_newt_lookup_pallas", "has_pallas_support"]
