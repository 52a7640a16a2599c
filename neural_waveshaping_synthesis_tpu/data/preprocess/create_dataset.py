"""Dataset builder: preprocess files -> stats -> splits -> .npy shards.

Reference: ``data/utils/create_dataset.py:13-165``. Parity notes:
  * control arrays stack (f0, loudness, confidence, mfcc...) = 19
    channels, stored channel-first (C, T_ctrl) per shard;
  * global stats: mean of per-segment means; std pooled as the
    length-weighted RMS of per-segment stds (the reference's formula —
    it ignores between-segment mean spread; reproduced for stat parity);
  * audio shards normalized by the corpus max |sample| observed across
    segments; control z-scored per channel;
  * recursive shuffle-split into train/val/test 0.8/0.1/0.1 (a local
    permutation split replaces sklearn.train_test_split — same
    proportions, one fewer dependency);
  * temp shards deleted at the end.
"""
import os
import shutil
from typing import Dict, List, Sequence

import numpy as np

from ... import minigin as gin
from .preprocess_audio import preprocess_audio


def create_directories(target_root: str, names: Sequence[str]) -> None:
    os.makedirs(target_root, exist_ok=True)
    for name in names:
        os.makedirs(os.path.join(target_root, name), exist_ok=True)


def make_splits(
    audio_list: Sequence[str],
    control_list: Sequence[str],
    splits: Sequence[str],
    split_proportions: Sequence[float],
    rng: np.random.Generator,
) -> Dict[str, Dict[str, List[str]]]:
    """Recursive proportional shuffle split (reference :31-70)."""
    assert len(splits) == len(split_proportions)
    if len(splits) == 1:
        return {splits[0]: {"audio": list(audio_list), "control": list(control_list)}}
    n = len(audio_list)
    n_first = int(round(n * split_proportions[0] / np.sum(split_proportions)))
    perm = rng.permutation(n)
    first, rest = perm[:n_first], perm[n_first:]
    take = lambda lst, idx: [lst[i] for i in idx]
    return {
        splits[0]: {
            "audio": take(audio_list, first),
            "control": take(control_list, first),
        },
        **make_splits(
            take(audio_list, rest),
            take(control_list, rest),
            splits[1:],
            split_proportions[1:],
            rng,
        ),
    }


def lazy_create_dataset(
    files: Sequence[str],
    output_directory: str,
    splits: Sequence[str],
    split_proportions: Sequence[float],
    seed: int = 0,
) -> None:
    audio_files: List[str] = []
    control_files: List[str] = []
    audio_max = 1e-5
    means, stds, lengths = [], [], []

    for i, (all_audio, all_f0, all_conf, all_loud, all_mfcc) in enumerate(
        preprocess_audio(files)
    ):
        stem = os.path.split(files[i])[-1].replace(".wav", "")
        for j, (audio, f0, conf, loud, mfcc) in enumerate(
            zip(all_audio, all_f0, all_conf, all_loud, all_mfcc)
        ):
            audio_name = f"audio_{stem}_{j}.npy"
            control_name = f"control_{stem}_{j}.npy"
            audio_max = max(audio_max, float(np.abs(audio).max()))
            np.save(
                os.path.join(output_directory, "temp", "audio", audio_name), audio
            )
            control = np.concatenate(
                (np.stack((f0, loud, conf), axis=0), mfcc), axis=0
            )
            np.save(
                os.path.join(output_directory, "temp", "control", control_name),
                control,
            )
            audio_files.append(audio_name)
            control_files.append(control_name)
            means.append(control.mean(axis=-1))
            stds.append(control.std(axis=-1))
            lengths.append(control.shape[-1])

    if not audio_files:
        print("[create_dataset] no datapoints to split, skipping")
        return

    data_mean = np.mean(np.stack(means, axis=-1), axis=-1)[:, np.newaxis]
    w = np.stack(lengths)[np.newaxis, :]
    s = np.stack(stds, axis=-1)
    data_std = np.sqrt(np.sum(w * s**2, axis=-1) / np.sum(w))[:, np.newaxis]

    np.save(os.path.join(output_directory, "data_mean.npy"), data_mean)
    np.save(os.path.join(output_directory, "data_std.npy"), data_std)

    rng = np.random.default_rng(seed)
    split_map = make_splits(audio_files, control_files, splits, split_proportions, rng)
    for split, contents in split_map.items():
        for audio_file in contents["audio"]:
            audio = np.load(os.path.join(output_directory, "temp", "audio", audio_file))
            np.save(
                os.path.join(output_directory, split, "audio", audio_file),
                audio / audio_max,
            )
        for control_file in contents["control"]:
            control = np.load(
                os.path.join(output_directory, "temp", "control", control_file)
            )
            np.save(
                os.path.join(output_directory, split, "control", control_file),
                (control - data_mean) / data_std,
            )


@gin.configurable
def create_dataset(
    files: Sequence[str],
    output_directory: str,
    splits: Sequence[str] = ("train", "val", "test"),
    split_proportions: Sequence[float] = (0.8, 0.1, 0.1),
    lazy: bool = True,
    seed: int = 0,
) -> None:
    create_directories(output_directory, (*splits, "temp"))
    for split in (*splits, "temp"):
        create_directories(os.path.join(output_directory, split), ("audio", "control"))
    if lazy:
        lazy_create_dataset(files, output_directory, splits, split_proportions, seed)
    shutil.rmtree(os.path.join(output_directory, "temp"))
