"""NEWT waveshaper core and its FastNEWT inference optimization.

Reference: ``models/modules/shaping.py:40-151``. The NEWT block predicts
4*C FiLM parameters per control frame from the control embedding,
upsamples them to audio rate, modulates the exciter, pushes it through
the bank of learned scalar shapers, re-normalizes with a second FiLM,
and mixes the C shaper outputs down to one channel.

FastNEWT (shaping.py:82-151) bakes the shaper bank into a lookup table.
The reference's lookup is a nested Python loop over batch x shaper
(shaping.py:121-134); here it is a single vectorized gather with linear
interpolation — and on TPU we keep the table channels-last (S, C) so
the gather indexes the sublane axis while channels ride the lanes.
"""
from dataclasses import dataclass, field
from typing import Dict, Optional

from .. import minigin as gin
import jax
import jax.numpy as jnp

from ..ops.upsample import linear_upsample
from .modules import (
    Params,
    TimeDistributedMLP,
    TrainableNonlinearity,
    dense_apply,
    dense_init,
    film,
)


@gin.configurable
@dataclass(frozen=True)
class NEWT:
    n_waveshapers: int = 64
    control_embedding_size: int = 128
    shaping_fn_size: int = 8
    out_channels: int = 1
    shaping_fn_depth: int = 4
    # rematerialize the shaper bank in backward: trades recompute FLOPs
    # for not storing the (B, Ta, C, W) inter-layer activations — the
    # training step's dominant HBM traffic (models/modules.py apply()).
    remat_shaper: bool = False
    # default for apply()'s ``fused`` argument: None/False = XLA einsum
    # chain, True = half-lane Pallas kernel, 'full_lane' = the (R/2,
    # 128)-lane recomputing kernel, 'full_lane_cr'/'cr' = full-lane
    # with the control->audio FiLM upsample folded in-kernel (the
    # audio-rate film array never exists). The two cr spellings differ
    # only in the unsupported-geometry fallback: 'full_lane_cr' drops
    # to the audio-rate kernel (right for training, where full_lane
    # still beats the chain fwd+bwd), 'cr' drops to the chain (right
    # for inference, where full_lane loses forward-only 18.0 vs 15.1).
    # v5e, canonical train shape, f32 (profile_train_step newt probes +
    # time_train_step, 2026-08-19): NEWT fwd+bwd 19.6 ms (cr) vs 32.5
    # (full_lane) vs 40.1 (chain); full train step 31.2 vs 44.1 vs
    # 57.4 ms. Forward-only also flips to the kernel under cr (7.1 vs
    # 15.1 chain — the chain's only edge was fusing the upsample, which
    # cr does in-kernel), which lifts the batch-1 resynthesis headline
    # 1857 -> 3066x realtime (bench.py, canonical 5-run median, band
    # 2921-3097 across tunnel windows — README) — hence the
    # default is 'cr'. Training gin configs opt into 'full_lane_cr';
    # engaged on the TPU backend only — on CPU (tests, the driver's
    # virtual-mesh dryrun) apply() keeps the einsum path rather than
    # crawling through Pallas interpret mode.
    fused: Optional[str] = "cr"
    # A/B knob for the cr kernel under narrow compute dtypes: keep the
    # CONTROL-rate film windows f32 while exciter/output stay in the
    # compute dtype. The window traffic is control-rate-tiny either
    # way; what changes is the in-kernel frame converts (f32 windows
    # skip the bf16->f32 casts before the lerp) and the film's bf16
    # rounding. No effect when the compute dtype is already f32.
    # Measured (v5e 2026-08-20, time_train_step, bf16 recipe): 40.4
    # ms/step vs the XLA chain's 39.4 — the kernel loses under bf16
    # even with halved exciter/output HBM traffic, so the bf16 gin
    # keeps `NEWT.fused = None` (gin/train/train_newt_bf16.gin).
    cr_film_f32: bool = False

    @property
    def mlp(self) -> TimeDistributedMLP:
        return TimeDistributedMLP(
            self.control_embedding_size,
            self.control_embedding_size,
            self.n_waveshapers * 4,
            depth=4,
        )

    @property
    def shaping_fn(self) -> TrainableNonlinearity:
        return TrainableNonlinearity(
            self.n_waveshapers,
            self.shaping_fn_size,
            depth=self.shaping_fn_depth,
            nonlinearity="sine",
            final_nonlinearity="sine",
        )

    def init(self, key) -> Params:
        k_mlp, k_fn, k_mix = jax.random.split(key, 3)
        return {
            "mlp": self.mlp.init(k_mlp),
            "shaping_fn": self.shaping_fn.init(k_fn),
            "mixer": dense_init(k_mix, self.n_waveshapers, self.out_channels),
        }

    def film_params(self, p: Params, control_embedding: jnp.ndarray) -> jnp.ndarray:
        """(B, Tc, E) -> (B, Tc, 4C) control-rate FiLM parameters."""
        return self.mlp.apply(p["mlp"], control_embedding)

    def apply(
        self,
        p: Params,
        exciter: jnp.ndarray,
        control_embedding: jnp.ndarray,
        lookup_table: Optional[jnp.ndarray] = None,
        table_min: float = -3.0,
        table_max: float = 3.0,
        fused: Optional[bool] = None,
    ) -> jnp.ndarray:
        """(B, Ta, C) exciter + (B, Tc, E) embedding -> (B, Ta, out_channels).

        If ``lookup_table`` (S, C) is given, the shaper bank is replaced by
        the FastNEWT interpolated table lookup.

        ``fused`` selects a Pallas fused FiLM->shaper->FiLM kernel
        (kernels/newt_fused.py): True = half-lane (TILE, 64) planes,
        'full_lane' = row-paired (TILE, 128) planes, 'full_lane_cr' /
        'cr' = full-lane with the control->audio FiLM upsample computed
        in-kernel (gated by ``newt_fused.supports_cr``; on unsupported
        geometries 'full_lane_cr' falls back to the audio-rate kernel,
        'cr' to the XLA chain — see the field comment). None defers to
        the ``NEWT.fused`` field (TPU backend only). Measured numbers:
        see the field comment above.
        """
        fp = self.film_params(p, control_embedding)  # (B, Tc, 4C)
        c = self.n_waveshapers

        if fused is None:
            fused = (
                self.fused
                if self.fused and jax.default_backend() == "tpu"
                else False
            )
        if fused in ("full_lane_cr", "cr") and lookup_table is None:
            from ..kernels import newt_fused

            if newt_fused.supports_cr(
                self.shaping_fn, exciter.shape[1], fp.shape[1]
            ):
                # control-rate variant: the FiLM upsample happens
                # INSIDE the kernel (kernels/newt_fused.py §cr), so the
                # (B, Ta, 4C) audio-rate film array never exists
                weights = newt_fused.pack_weights_fl(p["shaping_fn"])
                if self.cr_film_f32 and fp.dtype != jnp.float32:
                    # mixed-dtype call: f32 windows, compute-dtype
                    # exciter/output (the kernel derives its plane and
                    # output dtypes from the exciter)
                    fp = fp.astype(jnp.float32)
                x = newt_fused.film_shaper_fused_cr(
                    exciter, fp, weights, exciter.shape[1] // fp.shape[1]
                )
                return dense_apply(p["mixer"], x)
            # unsupported shape: audio-rate kernel for the training
            # spelling, XLA chain for the inference default ('cr')
            fused = "full_lane" if fused == "full_lane_cr" else False

        fp = linear_upsample(fp, exciter.shape[1])  # (B, Ta, 4C)

        if fused and lookup_table is None:
            from ..kernels import newt_fused

            if newt_fused.supports(self.shaping_fn):
                if fused in ("full_lane", "fl"):
                    # (R/2, 128)-lane variant: all VPU ops full-lane
                    # (Mosaic half-lane codegen measured ~2x slower,
                    # scripts/roofline_shaper.py pallas_fma64 vs 128)
                    weights = newt_fused.pack_weights_fl(p["shaping_fn"])
                    x = newt_fused.film_shaper_fused_fl(exciter, fp, weights)
                else:
                    weights = newt_fused.pack_weights(p["shaping_fn"])
                    x = newt_fused.film_shaper_fused(exciter, fp, weights)
                return dense_apply(p["mixer"], x)

        gamma_idx, beta_idx, gamma_norm, beta_norm = (
            fp[..., :c],
            fp[..., c : 2 * c],
            fp[..., 2 * c : 3 * c],
            fp[..., 3 * c :],
        )

        x = film(exciter, gamma_idx, beta_idx)
        if lookup_table is None:
            shaper = self.shaping_fn.apply
            if self.remat_shaper:
                shaper = jax.checkpoint(shaper)
            x = shaper(p["shaping_fn"], x)
        else:
            x = fast_newt_lookup(lookup_table, x, table_min, table_max)
        x = film(x, gamma_norm, beta_norm)
        return dense_apply(p["mixer"], x)

    def bake_lookup_table(
        self,
        p: Params,
        table_size: int = 4096,
        table_min: float = -3.0,
        table_max: float = 3.0,
    ) -> jnp.ndarray:
        """FastNEWT table bake -> (table_size, C)."""
        return self.shaping_fn.bake_table(
            p["shaping_fn"], table_size, table_min, table_max
        )


def fast_newt_lookup(
    table: jnp.ndarray, x: jnp.ndarray, table_min: float = -3.0, table_max: float = 3.0
) -> jnp.ndarray:
    """Linear-interpolated per-channel table lookup.

    Args:
      table: (S, C) baked shaper values.
      x: (B, T, C) inputs.

    Index arithmetic matches shaping.py:136-151: idx = S*(x-min)/(max-min),
    floor clamped to [0, S-1], upper = min(lower+1, S-1) — including the
    reference's quirk of scaling by S rather than S-1 (a 1-bin stretch
    baked into its published RTF/quality numbers).
    """
    s = table.shape[0]
    idx = s * (x - table_min) / (table_max - table_min)
    lower = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, s - 1)
    upper = jnp.minimum(lower + 1, s - 1)
    fract = idx - lower.astype(idx.dtype)
    # Gather along the table axis per channel: take_along_axis over S with
    # channel alignment — (B, T, C) indices into (S, C).
    lower_v = jnp.take_along_axis(table[None, :, :], lower.reshape(x.shape[0], -1, x.shape[2]), axis=1).reshape(x.shape)
    upper_v = jnp.take_along_axis(table[None, :, :], upper.reshape(x.shape[0], -1, x.shape[2]), axis=1).reshape(x.shape)
    return (upper_v - lower_v) * fract + lower_v
