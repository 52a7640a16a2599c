"""Dataset + DataModule over the reference's ``.npy`` shard layout.

Directory format (identical to the reference, so datasets interchange —
``data/general.py:9-57`` / ``data/utils/create_dataset.py:132-148``):

    <root>/
      data_mean.npy, data_std.npy          # (19, 1) control stats
      {train,val,test}/
        audio/audio_<name>.npy             # (T_audio,) float32, 4 s
        control/control_<name>.npy         # (19, T_ctrl) z-scored

Control channels: 0 = f0 (Hz), 1 = loudness, 2 = CREPE confidence,
3-18 = MFCC. Items expose denormalized f0/amp like the reference.

TPU-first loading: instead of torch DataLoader worker processes, the
whole split is memory-mapped/stacked into contiguous numpy arrays once
(a 4-s split is tiny — a few hundred MB at most) and batches are
sliced views converted to device arrays. Batch shapes are STATIC
(drop-remainder) so every training step reuses one compiled program.
"""
import os
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np

from .. import minigin as gin


class GeneralDataset:
    """Eagerly-stacked split of (audio, control) pairs.

    Unlike the reference's per-item ``__getitem__``, data lives in two
    dense arrays; item access and batch slicing are O(1) views.
    """

    def __init__(self, path: str, split: str = "train", load_to_memory: bool = True,
                 dtype=np.float32):
        self.path = path
        self.split = split
        self.load_to_memory = load_to_memory
        # storage contract is float32; dtype=np.float64 exists for the
        # fit-level mesh-equivalence tests, where f32 batch data would
        # reintroduce sharding-dependent f32 reassociation noise
        self.dtype = np.dtype(dtype)
        self._split_path = os.path.join(path, split)
        audio_dir = os.path.join(self._split_path, "audio")
        self.names = sorted(
            f[len("audio_") : -len(".npy")]
            for f in os.listdir(audio_dir)
            if f.endswith(".npy") and f.startswith("audio_")
        )
        self.data_mean = np.load(os.path.join(path, "data_mean.npy")).astype(
            self.dtype
        )  # (C, 1)
        self.data_std = np.load(os.path.join(path, "data_std.npy")).astype(self.dtype)

        # load_to_memory=False (reference data/general.py:13) keeps shards
        # on disk and loads per batch — for corpora that outgrow host RAM.
        # The Trainer's on-device fast path only engages for in-memory
        # datasets (it stages `self.audio`/`self.control` to HBM).
        self.audio: Optional[np.ndarray] = None
        self.control: Optional[np.ndarray] = None
        if load_to_memory:
            self.audio, self.control = self._load_indices(
                np.arange(len(self.names))
            )

    def _load_indices(self, indices) -> "tuple[np.ndarray, np.ndarray]":
        audio_list, control_list = [], []
        for i in indices:
            name = self.names[i]
            audio_list.append(
                np.load(os.path.join(self._split_path, "audio", f"audio_{name}.npy"))
            )
            control_list.append(
                np.load(
                    os.path.join(self._split_path, "control", f"control_{name}.npy")
                )
            )
        if audio_list:
            audio = np.stack(audio_list).astype(self.dtype)  # (N, Ta)
            # stored channel-first (C, Tc) -> channels-last (N, Tc, C)
            control = np.stack(control_list).astype(self.dtype).transpose(0, 2, 1)
        else:
            audio = np.zeros((0, 0), self.dtype)
            control = np.zeros((0, 0, 0), self.dtype)
        return audio, control

    def __len__(self) -> int:
        return len(self.names)

    def denormalize(self, control_tc: np.ndarray) -> np.ndarray:
        """(…, Tc, C) z-scored -> physical units."""
        return control_tc * self.data_std.T + self.data_mean.T

    def __getitem__(self, idx: int) -> Dict:
        if self.load_to_memory:
            audio, control = self.audio[idx], self.control[idx]
        else:
            a, ctl = self._load_indices([idx])
            audio, control = a[0], ctl[0]
        denorm = self.denormalize(control)
        return {
            "audio": audio,
            "f0": denorm[:, 0],
            "amp": denorm[:, 1],
            "control": control,
            "name": self.names[idx],
        }

    def batch(self, indices: np.ndarray) -> Dict:
        if self.load_to_memory:
            audio, control = self.audio[indices], self.control[indices]
        else:
            audio, control = self._load_indices(indices)
        denorm = self.denormalize(control)
        return {
            "audio": audio,
            "f0": denorm[:, :, 0],
            "control": control,
        }


@gin.configurable
class GeneralDataModule:
    """Batch streams for train/val/test (reference data/general.py:60-97).

    Train batches are shuffled per pass with a JAX PRNG key and sized
    statically (remainder dropped — jit wants one shape). Val/test
    iterate deterministically; a short final batch is dropped the same
    way (documented deviation: PL pads nothing either, but allows
    ragged final batches — ragged shapes would force recompiles here).
    """

    def __init__(
        self,
        data_root: str,
        batch_size: int = 16,
        load_to_memory: bool = True,
        dtype=np.float32,
    ):
        self.data_root = data_root
        self.batch_size = batch_size
        self.load_to_memory = load_to_memory
        self.dtype = dtype
        self._splits: Dict[str, GeneralDataset] = {}

    def dataset(self, split: str) -> GeneralDataset:
        if split not in self._splits:
            self._splits[split] = GeneralDataset(
                self.data_root, split, self.load_to_memory, dtype=self.dtype
            )
        return self._splits[split]

    def _effective_batch(self, n: int) -> int:
        return min(self.batch_size, n) if n else 0

    def train_batches(self, key) -> Iterator[Dict]:
        ds = self.dataset("train")
        n = len(ds)
        bs = self._effective_batch(n)
        if not bs:
            return
        perm = np.asarray(jax.random.permutation(key, n))
        for start in range(0, n - bs + 1, bs):
            yield ds.batch(perm[start : start + bs])

    def _eval_batches(self, split: str) -> Iterator[Dict]:
        ds = self.dataset(split)
        n = len(ds)
        bs = self._effective_batch(n)
        if not bs:
            return
        idx = np.arange(n)
        for start in range(0, n - bs + 1, bs):
            yield ds.batch(idx[start : start + bs])

    def val_batches(self) -> Iterator[Dict]:
        return self._eval_batches("val")

    def test_batches(self) -> Iterator[Dict]:
        return self._eval_batches("test")
