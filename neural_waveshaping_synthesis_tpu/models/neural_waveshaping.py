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

        exciter = self.render_exciter(
            p, f0_up, key=k_phase, phase_offset=phase_offset
        )
        embedding, _ = self.get_embedding(p, control)

        cd = jnp.dtype(self.compute_dtype)
        if cd != jnp.float32:
            newt_p = jax.tree_util.tree_map(lambda x: x.astype(cd), p["newt"])
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
