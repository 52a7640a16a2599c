"""Generate a synthetic monophonic instrument corpus for training runs.

The environment has no URMP download, so full-recipe training
demonstrations (the reference's 120k-step runs, gin/train/train_newt.gin)
use this corpus: additive-synthesis "string-like" performances with the
statistics the NEWT control stack expects — monophonic f0 in the violin
register, vibrato, legato note transitions, ADSR dynamics, correlated
bow/breath noise, and rests (which the CREPE/YIN confidence filter then
prunes, exercising the same path URMP does).

Every file is deterministic in (--seed, file index); the corpus is
reproducible bit-for-bit.

Example:
    python scripts/make_synthetic_corpus.py --output-directory /data/synth \
        --n-files 16 --duration 225
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np
from scipy.io import wavfile

SR = 16000
# A-minor pentatonic across the violin's comfortable range
SCALE_MIDI = np.array(
    [57, 60, 62, 64, 67, 69, 72, 74, 76, 79, 81, 84]
)

# Per-instrument performance/timbre specs. "vn" is the original
# string-like generator (the 120k-run corpus, RESULTS.md §1) — its
# parameter ranges and RNG draw ORDER are frozen so the corpus stays
# bit-reproducible. "tpt" is a brass-like second instrument for the
# URMP per-instrument orchestration demo (reference
# checkpoints/nws/tpt: trumpet, 24k steps): higher rest rate
# (phrase breathing), longer sustained notes, slower attacks, full
# harmonic series with slow rolloff (no even/odd suppression),
# shallower/slower vibrato, less bow-noise.
INSTRUMENTS = {
    "vn": dict(
        scale=SCALE_MIDI, rest_p=0.08, rest_dur=(0.2, 0.8),
        note_dur=(0.25, 1.8), attack=(0.02, 0.08), release=(0.03, 0.12),
        vib_hz=(5.0, 6.5), vib_depth=(0.10, 0.25),
        rolloff=(0.9, 2.0), even_gain=(0.4, 1.0), noise_level=0.02,
    ),
    # Bb-ish pentatonic in the trumpet register (sounding ~Bb3-G5)
    "tpt": dict(
        scale=np.array([58, 60, 63, 65, 67, 70, 72, 75, 77, 79]),
        rest_p=0.14, rest_dur=(0.3, 1.0),
        note_dur=(0.35, 2.2), attack=(0.03, 0.10), release=(0.04, 0.15),
        vib_hz=(4.5, 6.0), vib_depth=(0.03, 0.10),
        rolloff=(0.6, 1.2), even_gain=(0.85, 1.0), noise_level=0.012,
    ),
    # Flute-like third instrument (reference checkpoints/nws/fl: flute,
    # 120k steps): D-major scale in the flute register (D4-D6), nearly
    # pure tone (steep harmonic rolloff, no even/odd suppression), the
    # most breath noise of the three, soft releases, light 4.5-5.5 Hz
    # vibrato, frequent short phrase breaths.
    "fl": dict(
        scale=np.array([62, 64, 66, 67, 69, 71, 73, 74, 76, 78, 79, 81, 83, 86]),
        rest_p=0.16, rest_dur=(0.25, 0.9),
        note_dur=(0.3, 1.6), attack=(0.015, 0.06), release=(0.05, 0.18),
        vib_hz=(4.5, 5.5), vib_depth=(0.05, 0.15),
        rolloff=(1.6, 2.6), even_gain=(0.7, 1.0), noise_level=0.035,
    ),
}


def midi_to_hz(m):
    return 440.0 * 2.0 ** ((np.asarray(m, np.float64) - 69.0) / 12.0)


def _smooth(x: np.ndarray, win: int) -> np.ndarray:
    """Box-filter smoothing (edge-padded) — cheap legato/ramp shaping."""
    if win <= 1:
        return x
    k = np.ones(win) / win
    return np.convolve(np.pad(x, (win // 2, win - 1 - win // 2), mode="edge"), k, "valid")


def make_performance(rng: np.random.Generator, duration: float, spec=None):
    """-> (f0[T] Hz with 0 in rests, amp[T] in [0,1]) note-level curves."""
    spec = spec or INSTRUMENTS["vn"]
    scale = spec["scale"]
    t_total = int(duration * SR)
    f0 = np.zeros(t_total)
    amp = np.zeros(t_total)
    pos = 0
    deg = rng.integers(2, len(scale) - 2)
    while pos < t_total:
        if rng.random() < spec["rest_p"]:  # rest
            pos += int(rng.uniform(*spec["rest_dur"]) * SR)
            continue
        # random walk on the scale, occasional leaps
        step = rng.choice([-2, -1, -1, 1, 1, 2]) if rng.random() > 0.15 else rng.integers(-4, 5)
        deg = int(np.clip(deg + step, 0, len(scale) - 1))
        dur = int(rng.uniform(*spec["note_dur"]) * SR)
        dur = min(dur, t_total - pos)
        if dur < SR // 10:
            break
        hz = midi_to_hz(scale[deg]) * 2.0 ** (rng.normal(0, 0.003))
        # ADSR: attack + release per spec, sustain with slow swell
        a = int(rng.uniform(*spec["attack"]) * SR)
        r = int(rng.uniform(*spec["release"]) * SR)
        a, r = min(a, dur // 3), min(r, dur // 3)
        env = np.ones(dur)
        env[:a] = np.linspace(0, 1, a, endpoint=False)
        env[dur - r:] = np.linspace(1, 0, r)
        swell = 1.0 + 0.25 * np.sin(np.pi * np.arange(dur) / dur * rng.uniform(0.8, 1.6))
        level = rng.uniform(0.35, 1.0)
        f0[pos:pos + dur] = hz
        amp[pos:pos + dur] = np.maximum(env * swell * level, 0)
        pos += dur
    return f0, amp


def render(rng: np.random.Generator, duration: float, spec=None) -> np.ndarray:
    spec = spec or INSTRUMENTS["vn"]
    f0, amp = make_performance(rng, duration, spec)
    t_total = len(f0)
    voiced = f0 > 0

    # legato: smooth pitch transitions inside voiced runs (30 ms),
    # keeping rests at 0 by smoothing in the log domain over voiced spans
    f0_s = _smooth(np.where(voiced, f0, np.maximum(f0.max(), 1.0)), int(0.03 * SR))
    f0_s = np.where(voiced, f0_s, 0.0)
    amp = _smooth(amp, int(0.01 * SR))

    # vibrato: per-spec rate/depth (semitones), delayed onset via its
    # own envelope
    vib_hz = rng.uniform(*spec["vib_hz"])
    vib_depth = rng.uniform(*spec["vib_depth"]) / 12.0  # in octaves
    vib_env = _smooth(voiced.astype(float), int(0.25 * SR))  # fades in ~250 ms
    vib = 2.0 ** (vib_depth * vib_env * np.sin(2 * np.pi * vib_hz * np.arange(t_total) / SR))
    f0_v = f0_s * vib

    # timbre: harmonic rolloff + even/odd balance, fixed per file
    rolloff = rng.uniform(*spec["rolloff"])
    even_gain = rng.uniform(*spec["even_gain"])
    n_harm = 40
    k = np.arange(1, n_harm + 1)
    a_k = 1.0 / k ** rolloff
    a_k[1::2] *= even_gain
    a_k /= a_k.sum()

    phase = 2 * np.pi * np.cumsum(f0_v) / SR
    audio = np.zeros(t_total)
    nyq = SR / 2.0
    for i, kk in enumerate(k):  # accumulate per harmonic: bounded memory
        mask = (f0_v * kk) < nyq
        audio += a_k[i] * np.sin(kk * phase) * mask

    # correlated bow/breath noise: white noise band-shaped by a simple
    # first-difference highpass + moving-average lowpass, scaled with amp
    noise = rng.standard_normal(t_total)
    noise = _smooth(np.diff(noise, prepend=0.0), 5)
    audio = audio * amp + spec["noise_level"] * noise * np.sqrt(np.maximum(amp, 0))

    peak = np.abs(audio).max()
    if peak > 0:
        audio = 0.6 * audio / peak
    return audio.astype(np.float32)


@click.command()
@click.option("--output-directory", required=True)
@click.option("--n-files", default=16)
@click.option("--duration", default=225.0, help="Seconds per file")
@click.option("--seed", default=0)
@click.option("--instrument", default="vn",
              type=click.Choice(sorted(INSTRUMENTS)),
              help="Instrument spec (vn: the original string-like "
                   "generator, bit-identical to earlier corpora)")
@click.option("--urmp-layout", is_flag=True,
              help="Write URMP-style per-piece stem files "
                   "(<NN>_Synth_<ins>/AuSep_1_<ins>_<NN>_Synth.wav) so "
                   "create_urmp_dataset.py discovers them")
def main(output_directory, n_files, duration, seed, instrument, urmp_layout):
    import zlib

    spec = INSTRUMENTS[instrument]
    # instrument folds into the seed so vn (offset 0 preserved for
    # reproducibility of the shipped corpora) and tpt draw distinct
    # streams even at the same --seed
    ins_off = 0 if instrument == "vn" else zlib.crc32(instrument.encode())
    os.makedirs(output_directory, exist_ok=True)
    for i in range(n_files):
        rng = np.random.default_rng(seed * 10007 + i + ins_off)
        audio = render(rng, duration, spec)
        if urmp_layout:
            piece = os.path.join(
                output_directory, f"{i + 1:02d}_Synth_{instrument}"
            )
            os.makedirs(piece, exist_ok=True)
            path = os.path.join(
                piece, f"AuSep_1_{instrument}_{i + 1:02d}_Synth.wav"
            )
        else:
            path = os.path.join(output_directory, f"synth_{i:02d}.wav")
        wavfile.write(path, SR, (audio * 32767).astype(np.int16))
        print(f"[make_synthetic_corpus] wrote {path} ({duration:.0f}s)")
    print(f"[make_synthetic_corpus] total {n_files * duration / 60:.1f} min")


if __name__ == "__main__":
    main()
