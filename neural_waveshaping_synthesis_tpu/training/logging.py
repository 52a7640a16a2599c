"""Metric/audio loggers (reference: PL self.log + wandb,
models/neural_waveshaping.py:114-165, scripts/train.py:62-66).

Three backends behind one duck-typed interface:
  ConsoleLogger — stdout lines
  CSVLogger     — append-only metrics.csv (host-side, cheap)
  WandbLogger   — optional; gated import, same metric names as the
                  reference (train/loss, val/loss, test/loss, audio/*)
"""
import csv
import os
import time
from typing import Dict, Optional

import numpy as np


class ConsoleLogger:
    def log_metrics(self, metrics: Dict, step: int):
        parts = " ".join(f"{k}={v:.6g}" for k, v in metrics.items())
        print(f"[step {step}] {parts}", flush=True)

    def log_audio(self, name: str, audio: np.ndarray, sample_rate: int, step: int):
        pass


class CSVLogger:
    def __init__(self, directory: str):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, "metrics.csv")
        self._wrote_header = os.path.exists(self.path)

    def log_metrics(self, metrics: Dict, step: int):
        row = {"step": step, "time": time.time(), **metrics}
        write_header = not self._wrote_header
        with open(self.path, "a", newline="") as f:
            writer = csv.DictWriter(
                f, fieldnames=["step", "time", "train/loss", "train/lr",
                               "train/steps_per_sec", "val/loss", "test/loss",
                               "grad_norm"],
                extrasaction="ignore",
            )
            if write_header:
                writer.writeheader()
                self._wrote_header = True
            writer.writerow(row)

    def log_audio(self, name: str, audio: np.ndarray, sample_rate: int, step: int):
        """Write eval audio snapshots as wavs next to the metrics."""
        from ..utils import write_wav

        audio_dir = os.path.join(os.path.dirname(self.path), "audio")
        os.makedirs(audio_dir, exist_ok=True)
        safe = name.replace("/", "_")
        write_wav(
            os.path.join(audio_dir, f"{safe}_step{step}.wav"), audio, sample_rate
        )


class WandbLogger:
    """Optional wandb backend; constructing it without wandb installed
    raises ImportError (the CLI only builds it under --with-wandb)."""

    def __init__(self, project: str = "neural-waveshaping-synthesis-tpu", **kwargs):
        import wandb

        self._wandb = wandb
        self.run = wandb.init(project=project, **kwargs)

    def log_metrics(self, metrics: Dict, step: int):
        self._wandb.log(metrics, step=step)

    def log_audio(self, name: str, audio: np.ndarray, sample_rate: int, step: int):
        self._wandb.log(
            {
                f"audio/{name}": self._wandb.Audio(
                    audio, sample_rate=sample_rate, caption=name
                )
            },
            step=step,
        )

    def log_params(self, params: Dict, step: int):
        """Parameter histograms + norms, the reference's
        ``logger.watch(model, log="parameters")`` (reference
        scripts/train.py:62-66). torch hooks don't exist for a JAX
        pytree, so the trainer calls this at every val interval with
        host-side arrays instead; wandb renders the same per-tensor
        histogram panels."""
        import jax

        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        payload, sq_sum = {}, 0.0
        for path, leaf in flat:
            arr = np.asarray(leaf)
            name = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            payload[f"parameters/{name}"] = self._wandb.Histogram(arr.ravel())
            sq_sum += float(np.sum(arr.astype(np.float64) ** 2))
        payload["parameters/global_norm"] = float(np.sqrt(sq_sum))
        self._wandb.log(payload, step=step)
