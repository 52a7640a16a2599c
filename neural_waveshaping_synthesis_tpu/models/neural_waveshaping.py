"""The full NEWT synthesizer graph.

Reference: ``models/neural_waveshaping.py:30-90``. The synthesis graph
(reference forward, SURVEY.md §3.3):

    f0 (B, Tc) Hz ──linear upsample──► f0 (B, Ta)
        └─► harmonic oscillator (B, Ta, 101) ──mixer──► exciter (B, Ta, 64)
    control (B, Tc, 2) ──GRU+proj──► embedding (B, Tc, 128)
        ├─► NEWT: FiLM ► shaper bank ► FiLM ► mix ──► (B, Ta, 1)
        └─► noise MLP ► H (B, Tc, 129) ► FIR noise ──► (B, Ta)
    sum ──► learned reverb ──► audio (B, Ta)

Layout notes (TPU-first, not a port): everything is channels-last so
the 101/64/128/129-wide channel axes ride the 128 vector lanes and the
mixer/projection layers are MXU matmuls. Stochasticity (oscillator
phases, noise excitation) is explicit-key; pass the same key to
reproduce a render bit-for-bit.

The training-loop concerns the reference buries in this class
(optimizers, logging, checkpointing) live in ``training/`` instead —
this module is a pure function of (params, inputs, key).
"""
from dataclasses import dataclass, field
from typing import Dict, NamedTuple, Optional, Tuple

from .. import minigin as gin
import jax
import jax.numpy as jnp

from ..ops.upsample import linear_upsample
from .generators import FIRNoiseSynth, HarmonicOscillator, Reverb
from .modules import ControlModule, Params, TimeDistributedMLP, dense_apply, dense_init
from .newt import NEWT


def _default_noise_mlp() -> TimeDistributedMLP:
    """The noise-branch H generator. When gin bindings are loaded, the
    reference's scoped config (``noise_synth/TimeDistributedMLP.*``,
    gin/models/newt.gin:20-23) fills the sizes; otherwise fall back to
    the shipped architecture (128 -> 128 -> 129, depth 4)."""
    with gin.config_scope("noise_synth"):
        try:
            return TimeDistributedMLP()
        except TypeError:
            return TimeDistributedMLP(128, 128, 129, depth=4)


def _default_noise_synth() -> FIRNoiseSynth:
    with gin.config_scope("noise_synth"):
        return FIRNoiseSynth()


@gin.configurable
@dataclass(frozen=True)
class NeuralWaveshaping:
    """Model configuration + pure init/apply.

    Hyperparameter surface matches the reference constructor
    (neural_waveshaping.py:31-62) plus the submodule configs that gin
    fills in the reference (we hold them explicitly — no hidden
    globals inside the model graph).
    """

    n_waveshapers: int = 64
    control_hop: int = 128
    sample_rate: float = 16000
    # Mixed precision for the audio-rate hot path (harmonic-mixer matmul
    # + the whole NEWT block: FiLM upsample, shaper bank, mixer) — the
    # HBM-bound ~70% of the training step. "bfloat16" halves that
    # traffic; phase accumulation, the noise/reverb FFT branches, and
    # the loss stay float32 (phase integrates to thousands of radians —
    # bf16 there is audible garbage). Master params and Adam state are
    # always float32; casting happens inside apply().
    compute_dtype: str = "float32"
    # Fold the harmonic bank + 101->64 mixer INTO the fused NEWT kernel
    # (kernels/newt_fused.py bank_film_shaper_fused_xcr) when the NEWT
    # config selects a control-rate kernel: the (B, Ta, 101) sinusoid
    # bank and the (B, Ta, 64) exciter never exist in HBM — only the
    # (B, Ta) wrapped phase / f0 tracks enter the kernel. A/B knob;
    # inert off-TPU and on unsupported geometries (falls back to
    # render_exciter + NEWT.apply).
    #
    # MEASURED ANTI-OPTIMIZATION on v5e, shipped OFF (like FastNEWT):
    # the bank is 101 transcendentals/sample and Mosaic's in-kernel
    # sine polynomial is slower than XLA's fused bank even counting the
    # ~340 MB/step HBM traffic it removes (platform rule 8). batch-1
    # headline 3060x (off) vs 2881x (xcr) vs 2808x (xfull); batch-8
    # f32 train step 30.9 (off) vs 31.7 ms (xfull)
    # (scripts/ab_fused_exciter.py + profile_train_step.py, 2026-08-20).
    fuse_exciter: bool = False
    # On top of fuse_exciter, also fold the NEWT 64->1 output mixer
    # into the kernel (bank_newt_fused_xfull): phase/f0 + control-rate
    # film in, AUDIO out — no (B, Ta, C)-wide array touches HBM in
    # either direction (the xcr spelling still writes the shaped
    # (B, Ta, C) signal for the XLA mixer, whose backward materializes
    # the same-size cotangent). A/B knob; requires out_channels == 1
    # and an active fuse_exciter path. Same measured verdict as
    # fuse_exciter (2808x vs 3060x at batch 1) — shipped OFF.
    fuse_out_mixer: bool = False
    # submodule configs (reference wires these through gin scopes)
    embedding: ControlModule = field(default_factory=ControlModule)
    osc: HarmonicOscillator = field(default_factory=HarmonicOscillator)
    newt: NEWT = field(default_factory=NEWT)
    noise_mlp: TimeDistributedMLP = field(default_factory=_default_noise_mlp)
    noise_synth: FIRNoiseSynth = field(default_factory=_default_noise_synth)
    reverb: Reverb = field(default_factory=Reverb)

    def init(self, key) -> Params:
        k_emb, k_mix, k_newt, k_noise, k_rev = jax.random.split(key, 5)
        return {
            "embedding": self.embedding.init(k_emb),
            "harmonic_mixer": dense_init(
                k_mix, self.osc.n_harmonics, self.n_waveshapers
            ),
            "newt": self.newt.init(k_newt),
            "h_generator": self.noise_mlp.init(k_noise),
            "reverb": self.reverb.init(k_rev),
        }

    # -- submodule forward pieces (reference :64-72) ------------------------
    def render_exciter(
        self,
        p: Params,
        f0_upsampled: jnp.ndarray,
        key: Optional[jax.Array] = None,
        phase_offset: Optional[jnp.ndarray] = None,
        initial_phase: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """(B, Ta) f0 -> (B, Ta, n_waveshapers) mixed harmonic exciter."""
        bank = self.osc.apply(
            f0_upsampled,
            key=key,
            phase_offset=phase_offset,
            initial_phase=initial_phase,
        )
        cd = jnp.dtype(self.compute_dtype)
        if cd != jnp.float32:
            # bf16 bank halves the (B, Ta, 101) HBM read; the dot still
            # accumulates in float32 (preferred_element_type), and the
            # result follows the input dtype (dense_apply's mixed-
            # precision contract) — the exciter stays bf16 downstream.
            mixer = {"w": p["harmonic_mixer"]["w"].astype(cd),
                     "b": p["harmonic_mixer"]["b"]}
            return dense_apply(mixer, bank.astype(cd))
        return dense_apply(p["harmonic_mixer"], bank)

    def get_embedding(
        self, p: Params, control: jnp.ndarray, h0: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, Tc, >=2) control -> ((B, Tc, E), GRU carry). Only the first
        two channels (normalized f0, loudness) are consumed
        (reference :69-72)."""
        return self.embedding.apply(p["embedding"], control[..., :2], h0)

    def _fused_exciter_newt(
        self,
        p: Params,
        f0_up: jnp.ndarray,
        embedding: jnp.ndarray,
        key: Optional[jax.Array],
        phase_offset: Optional[jnp.ndarray],
        force: bool = False,
    ) -> Optional[jnp.ndarray]:
        """The fully-fused synthesis hot path (``fuse_exciter``): wrapped
        phase + f0 -> bank + mixer + FiLM upsample + shaper, one Pallas
        kernel -> NEWT mixer. Returns (B, Ta, out_channels), or None
        when the path doesn't apply (caller falls back to
        render_exciter + NEWT.apply). ``force=True`` (tests) skips the
        backend/config gates but not the geometry gate."""
        newt = self.newt
        if not force:
            if not (
                self.fuse_exciter
                and newt.fused in ("cr", "full_lane_cr")
                and jax.default_backend() == "tpu"
            ):
                return None
        from ..ops import oscillator
        from ..kernels import newt_fused

        if oscillator.EXACT_SIN:
            return None  # A/B escape hatch: the kernel's sine is _psin
        if phase_offset is not None and phase_offset.ndim != 1:
            return None  # per-batch offsets are a streaming-only layout
        tc, ta = embedding.shape[1], f0_up.shape[1]
        if not newt_fused.supports_xcr(
            newt.shaping_fn, ta, tc, self.osc.n_harmonics
        ):
            return None

        if phase_offset is None and key is not None:
            phase_offset = oscillator.draw_phase_offset(
                key, self.osc.n_harmonics, f0_up.dtype
            )
        phase = jnp.mod(
            oscillator.phase_accumulate(f0_up, self.osc.sample_rate),
            oscillator.TAU,
        )
        cd = jnp.dtype(self.compute_dtype)
        newt_p = p["newt"]
        if cd != jnp.float32:
            newt_p = jax.tree_util.tree_map(lambda x: x.astype(cd), newt_p)
            embedding = embedding.astype(cd)
        fp = newt.film_params(newt_p, embedding)
        if newt.cr_film_f32 and fp.dtype != jnp.float32:
            fp = fp.astype(jnp.float32)
        mixer_pl = newt_fused.pack_mixer(
            p["harmonic_mixer"], None if cd == jnp.float32 else cd
        )
        offsets = newt_fused.pack_offsets(phase_offset, self.osc.n_harmonics)
        weights = newt_fused.pack_weights_fl(newt_p["shaping_fn"])
        if self.fuse_out_mixer and newt.out_channels == 1:
            audio = newt_fused.bank_newt_fused_xfull(
                phase,
                f0_up,
                offsets,
                fp,
                mixer_pl,
                newt_fused.pack_out_mixer(
                    newt_p["mixer"], None if cd == jnp.float32 else cd
                ),
                weights,
                self.osc.n_harmonics,
                self.osc.sample_rate,
                ta // tc,
            )
            out = (audio + newt_p["mixer"]["b"][0])[..., None]
        else:
            x = newt_fused.bank_film_shaper_fused_xcr(
                phase,
                f0_up,
                offsets,
                fp,
                mixer_pl,
                weights,
                self.osc.n_harmonics,
                self.osc.sample_rate,
                ta // tc,
            )
            out = dense_apply(newt_p["mixer"], x)
        return out.astype(jnp.float32) if cd != jnp.float32 else out

    # -- full graph ----------------------------------------------------------
    def apply(
        self,
        p: Params,
        f0: jnp.ndarray,
        control: jnp.ndarray,
        key: Optional[jax.Array] = None,
        lookup_table: Optional[jnp.ndarray] = None,
        phase_offset: Optional[jnp.ndarray] = None,
        noise: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Synthesize audio.

        Args:
          p: parameter pytree from ``init`` (or the checkpoint converter).
          f0: (B, Tc) denormalized f0 in Hz at the 125 Hz control rate.
          control: (B, Tc, C>=2) normalized control channels.
          key: PRNG key driving oscillator phase + noise excitation; the
            reference draws both fresh every forward (generators.py:30,55).
            None => deterministic (zero phase offsets, requires ``noise``
            or uses key-less uniform noise -- pass explicitly for tests).
          lookup_table: optional FastNEWT table (S, C) replacing the
            shaper bank.
          phase_offset / noise: deterministic injection hooks for golden
            tests (SURVEY.md §7 "stochasticity discipline").

        Returns:
          (B, Tc * control_hop) audio.
        """
        if key is not None:
            k_phase, k_noise = jax.random.split(key)
        else:
            k_phase = k_noise = None

        t_audio = f0.shape[1] * self.control_hop
        f0_up = linear_upsample(f0[..., None], t_audio)[..., 0]

        embedding, _ = self.get_embedding(p, control)

        cd = jnp.dtype(self.compute_dtype)
        shaped = None
        if lookup_table is None:
            shaped = self._fused_exciter_newt(
                p, f0_up, embedding, k_phase, phase_offset
            )
        if shaped is None:
            exciter = self.render_exciter(
                p, f0_up, key=k_phase, phase_offset=phase_offset
            )
            if cd != jnp.float32:
                newt_p = jax.tree_util.tree_map(
                    lambda x: x.astype(cd), p["newt"]
                )
                shaped = self.newt.apply(
                    newt_p, exciter.astype(cd), embedding.astype(cd),
                    lookup_table=lookup_table,
                ).astype(jnp.float32)
            else:
                shaped = self.newt.apply(
                    p["newt"], exciter, embedding, lookup_table=lookup_table
                )  # (B, Ta, 1)

        h = self.noise_mlp.apply(p["h_generator"], embedding)  # (B, Tc, 129)
        noise_audio = self.noise_synth.apply(h, key=k_noise, noise=noise)

        mixed = shaped[..., 0] + noise_audio
        return self.reverb.apply(p["reverb"], mixed)

    def n_params(self, p: Params) -> int:
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(p))
