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


def midi_to_hz(m):
    return 440.0 * 2.0 ** ((np.asarray(m, np.float64) - 69.0) / 12.0)


def _smooth(x: np.ndarray, win: int) -> np.ndarray:
    """Box-filter smoothing (edge-padded) — cheap legato/ramp shaping."""
    if win <= 1:
        return x
    k = np.ones(win) / win
    return np.convolve(np.pad(x, (win // 2, win - 1 - win // 2), mode="edge"), k, "valid")


def make_performance(rng: np.random.Generator, duration: float):
    """-> (f0[T] Hz with 0 in rests, amp[T] in [0,1]) note-level curves."""
    t_total = int(duration * SR)
    f0 = np.zeros(t_total)
    amp = np.zeros(t_total)
    pos = 0
    deg = rng.integers(2, len(SCALE_MIDI) - 2)
    while pos < t_total:
        if rng.random() < 0.08:  # rest
            pos += int(rng.uniform(0.2, 0.8) * SR)
            continue
        # random walk on the scale, occasional leaps
        step = rng.choice([-2, -1, -1, 1, 1, 2]) if rng.random() > 0.15 else rng.integers(-4, 5)
        deg = int(np.clip(deg + step, 0, len(SCALE_MIDI) - 1))
        dur = int(rng.uniform(0.25, 1.8) * SR)
        dur = min(dur, t_total - pos)
        if dur < SR // 10:
            break
        hz = midi_to_hz(SCALE_MIDI[deg]) * 2.0 ** (rng.normal(0, 0.003))
        # ADSR: attack 20-80 ms, release 30-120 ms, sustain with slow swell
        a = int(rng.uniform(0.02, 0.08) * SR)
        r = int(rng.uniform(0.03, 0.12) * SR)
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


def render(rng: np.random.Generator, duration: float) -> np.ndarray:
    f0, amp = make_performance(rng, duration)
    t_total = len(f0)
    voiced = f0 > 0

    # legato: smooth pitch transitions inside voiced runs (30 ms),
    # keeping rests at 0 by smoothing in the log domain over voiced spans
    f0_s = _smooth(np.where(voiced, f0, np.maximum(f0.max(), 1.0)), int(0.03 * SR))
    f0_s = np.where(voiced, f0_s, 0.0)
    amp = _smooth(amp, int(0.01 * SR))

    # vibrato: 5-6.5 Hz, 10-25 cents, delayed onset via its own envelope
    vib_hz = rng.uniform(5.0, 6.5)
    vib_depth = rng.uniform(0.10, 0.25) / 12.0  # in octaves
    vib_env = _smooth(voiced.astype(float), int(0.25 * SR))  # fades in ~250 ms
    vib = 2.0 ** (vib_depth * vib_env * np.sin(2 * np.pi * vib_hz * np.arange(t_total) / SR))
    f0_v = f0_s * vib

    # timbre: harmonic rolloff + even/odd balance, fixed per file
    rolloff = rng.uniform(0.9, 2.0)
    even_gain = rng.uniform(0.4, 1.0)
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
    audio = audio * amp + 0.02 * noise * np.sqrt(np.maximum(amp, 0))

    peak = np.abs(audio).max()
    if peak > 0:
        audio = 0.6 * audio / peak
    return audio.astype(np.float32)


@click.command()
@click.option("--output-directory", required=True)
@click.option("--n-files", default=16)
@click.option("--duration", default=225.0, help="Seconds per file")
@click.option("--seed", default=0)
def main(output_directory, n_files, duration, seed):
    os.makedirs(output_directory, exist_ok=True)
    for i in range(n_files):
        rng = np.random.default_rng(seed * 10007 + i)
        audio = render(rng, duration)
        path = os.path.join(output_directory, f"synth_{i:02d}.wav")
        wavfile.write(path, SR, (audio * 32767).astype(np.int16))
        print(f"[make_synthetic_corpus] wrote {path} ({duration:.0f}s)")
    print(f"[make_synthetic_corpus] total {n_files * duration / 60:.1f} min")


if __name__ == "__main__":
    main()
