"""Functional helpers + seeding.

Equivalent surface to the reference's ``utils/utils.py:5-23`` and
``utils/seed_all.py:6-12``, re-done for a JAX world: ``seed_all`` seeds
numpy/python (host-side preprocessing determinism) and returns a
``jax.random.PRNGKey`` — JAX device RNG is explicit-key, so there is no
global device seed to set (and nothing like ``cudnn.deterministic``
is needed: XLA is deterministic by default).
"""
import os
import random
from typing import Callable, Iterable, List, Sequence, Tuple

import numpy as np


def apply(fns: Sequence[Callable], arg):
    """Apply each fn in ``fns`` to ``arg``, returning the list of results."""
    return [fn(arg) for fn in fns]


def apply_unpack(fns: Sequence[Callable], args: Sequence):
    """Apply each fn to the unpacked ``args``."""
    return [fn(*args) for fn in fns]


def unzip(zipped: Iterable[Tuple]) -> List[Tuple]:
    """Inverse of zip: list of tuples -> tuple of lists."""
    return list(zip(*zipped))


def make_dir_if_not_exists(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def write_wav(path: str, audio, sample_rate: int) -> None:
    """Peak-normalize to 0.9 FS and write 16-bit PCM (shared by the
    resynthesis/timbre-transfer CLIs and the CSV logger's snapshots)."""
    import numpy as np
    from scipy.io import wavfile

    audio = np.asarray(audio)
    peak = np.abs(audio).max()
    scaled = audio / peak * 0.9 if peak > 0 else audio
    wavfile.write(path, int(sample_rate), (scaled * 32767).astype(np.int16))


def seed_all(seed: int):
    """Seed host-side RNGs and return a fresh JAX PRNG key.

    JAX device randomness is threaded explicitly through keys, so the
    returned key is the root of the reproducible device-side stream.
    """
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
