"""Eager (device-resident) vs lazy (host-streamed) data-path throughput.

docs/DESIGN.md §2.3 claims the chunked lazy path sits "within a few x"
of the on-device fast path — this script replaces that adjective with
a measured ratio at the canonical harness (batch 8, the full trainer
fit loop, steady-state steps/s from the trainer's own windowed rate).

Method: run ``Trainer.fit`` twice on the same corpus — once with
``load_to_memory=True`` (the fast path: training split staged in HBM,
batches gathered by index inside the jitted chunk scan) and once with
``load_to_memory=False`` (the lazy path: per-batch host assembly,
chunk-buffered ``device_put``, deferred loss fetch) — timestamping
every log window and reporting the post-warmup span rate
(steps elapsed / wall elapsed; see RateCapture for why window-local
rates are invalid under the lazy path's deferred fetch). The leading
windows are discarded (they carry jit compilation).

Needs a reference-format dataset directory (make one with
``scripts/make_synthetic_corpus.py`` + ``scripts/create_dataset.py``).
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click

from neural_waveshaping_synthesis_tpu import minigin as gin


class RateCapture:
    """Logger that timestamps every train-window log event.

    The steady-state rate is (last_step - first_step) / elapsed across
    the post-warmup span — NOT a median of per-window rates: the lazy
    path's deferred loss fetch makes individual log events fire at
    dispatch time (bursty), so window-local rates are meaningless while
    the span rate stays exact."""

    def __init__(self):
        self.windows = []

    def log_metrics(self, metrics, step):
        if "train/steps_per_sec" in metrics:
            self.windows.append((step, time.time(),
                                 float(metrics["train/steps_per_sec"])))

    def log_audio(self, name, audio, sample_rate, step):
        pass

    def span_rate(self, warmup_windows):
        w = self.windows[warmup_windows:]
        if len(w) < 2:
            w = self.windows
        if len(w) < 2:
            return float("nan")
        (s0, t0, _), (s1, t1, _) = w[0], w[-1]
        return (s1 - s0) / max(t1 - t0, 1e-9)


@click.command()
@click.option("--gin-file", multiple=True, default=("gin/train/train_newt.gin",))
@click.option("--dataset-path", required=True)
@click.option("--batch-size", default=8)
@click.option("--steps", default=384, help="Steps per variant")
@click.option("--log-every", default=64,
              help="Window size (also the chunk length via the gcd rule)")
@click.option("--warmup-windows", default=2,
              help="Leading windows discarded (compile + cache warm)")
def main(gin_file, dataset_path, batch_size, steps, log_every,
         warmup_windows):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in gin_file:
        gin.parse_config_file(
            os.path.join(repo, f) if not os.path.isabs(f) else f
        )
    gin.validate_config()

    import jax

    from neural_waveshaping_synthesis_tpu.data import GeneralDataModule
    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping
    from neural_waveshaping_synthesis_tpu.training import TrainConfig, Trainer

    print(f"[bench_data_path] device={jax.devices()[0]} batch={batch_size} "
          f"steps={steps} window={log_every}")

    results = {}
    for mode, load, i16 in (
        ("eager", True, False),
        ("lazy", False, False),
        ("lazy_i16", False, True),
    ):
        ckpt_dir = tempfile.mkdtemp(prefix=f"bench_data_{mode}_")
        cfg = TrainConfig(
            max_steps=steps,
            log_every_n_steps=log_every,
            # one val at the very end only (fit always closes with one)
            val_every_n_steps=10 ** 9,
            checkpoint_dir=ckpt_dir,
            lazy_int16_wire=i16,
        )
        dm = GeneralDataModule(
            dataset_path, batch_size=batch_size, load_to_memory=load
        )
        capture = RateCapture()
        model = NeuralWaveshaping()
        trainer = Trainer(model, cfg, loggers=[capture])
        trainer.fit(dm)
        shutil.rmtree(ckpt_dir, ignore_errors=True)

        rate = capture.span_rate(warmup_windows)
        results[mode] = rate
        print(f"  {mode:<5} steady-state {rate:8.2f} steps/s "
              f"({rate * batch_size * 4:.0f} audio-s/s; window rates "
              f"{[round(r, 2) for _, _, r in capture.windows]})")

    print(json.dumps({
        "eager_steps_per_s": round(results["eager"], 3),
        "lazy_steps_per_s": round(results["lazy"], 3),
        "lazy_i16_steps_per_s": round(results["lazy_i16"], 3),
        "eager_over_lazy": round(
            results["eager"] / max(results["lazy"], 1e-9), 3),
        "eager_over_lazy_i16": round(
            results["eager"] / max(results["lazy_i16"], 1e-9), 3),
    }))


if __name__ == "__main__":
    main()
