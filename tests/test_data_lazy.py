"""Lazy (load_to_memory=False) dataset mode: identical batches to the
in-memory mode, and the trainer falls back to the generic path."""
import numpy as np
import pytest

import jax

from neural_waveshaping_synthesis_tpu.data import GeneralDataModule, GeneralDataset

from test_training import synthetic_dataset, tiny_model  # noqa: F401


def test_lazy_matches_eager(synthetic_dataset):  # noqa: F811
    eager = GeneralDataset(synthetic_dataset, "train", load_to_memory=True)
    lazy = GeneralDataset(synthetic_dataset, "train", load_to_memory=False)
    assert lazy.audio is None and lazy.control is None
    assert len(lazy) == len(eager)

    idx = np.array([3, 0, 5])
    be, bl = eager.batch(idx), lazy.batch(idx)
    for k in ("audio", "f0", "control"):
        np.testing.assert_array_equal(be[k], bl[k])

    ie, il = eager[2], lazy[2]
    np.testing.assert_array_equal(ie["audio"], il["audio"])
    assert ie["name"] == il["name"]


def test_lazy_trains_via_generic_path(synthetic_dataset, tmp_path):  # noqa: F811
    from neural_waveshaping_synthesis_tpu.training import TrainConfig, Trainer

    cfg = TrainConfig(
        max_steps=2,
        val_every_n_steps=2,
        log_every_n_steps=2,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    dm = GeneralDataModule(synthetic_dataset, batch_size=8, load_to_memory=False)
    trainer = Trainer(tiny_model(), cfg)
    state = trainer.fit(dm)
    assert int(state["step"]) == 2


def test_lazy_int16_wire_matches_f32_wire(synthetic_dataset, tmp_path):  # noqa: F811
    """TrainConfig.lazy_int16_wire: the on-device dequant reproduces the
    f32-wire chunk path to 16-bit quantization error — same step count,
    per-window losses within the quantization-induced jitter."""
    from neural_waveshaping_synthesis_tpu.training import TrainConfig, Trainer

    losses = {}
    for name, i16 in (("f32", False), ("i16", True)):
        cfg = TrainConfig(
            max_steps=4,
            val_every_n_steps=4,
            log_every_n_steps=2,
            checkpoint_dir=str(tmp_path / f"ck_{name}"),
            lazy_int16_wire=i16,
        )
        dm = GeneralDataModule(
            synthetic_dataset, batch_size=8, load_to_memory=False
        )
        trainer = Trainer(tiny_model(), cfg)
        logged = []

        class Spy:
            def log_metrics(self, metrics, step):
                if "train/loss" in metrics:
                    logged.append((step, metrics["train/loss"]))

        trainer.loggers.append(Spy())
        state = trainer.fit(dm)
        assert int(state["step"]) == 4
        losses[name] = logged

    assert [s for s, _ in losses["f32"]] == [s for s, _ in losses["i16"]]
    for (_, a), (_, b) in zip(losses["f32"], losses["i16"]):
        # 16-bit target quantization (~3e-5 amplitude) through the
        # log-magnitude MR-STFT loss: small relative jitter, not drift
        assert abs(a - b) / max(abs(a), 1e-9) < 0.02, (a, b)


def test_lazy_chunked_path_stragglers_and_cadence(synthetic_dataset, tmp_path):  # noqa: F811
    """Chunked lazy training with a max_steps that is NOT a multiple of
    the chunk length: 3 full chunks of gcd(2,4)=2 then one single-step
    drain, log/val cadence firing at thresholds, and exactly one final
    val/checkpoint."""
    from neural_waveshaping_synthesis_tpu.training import TrainConfig, Trainer

    cfg = TrainConfig(
        max_steps=7,
        val_every_n_steps=4,
        log_every_n_steps=2,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    dm = GeneralDataModule(synthetic_dataset, batch_size=8, load_to_memory=False)
    trainer = Trainer(tiny_model(), cfg)

    logged = []

    class Spy:
        def log_metrics(self, metrics, step):
            logged.append((step, dict(metrics)))

    trainer.loggers.append(Spy())
    state = trainer.fit(dm)
    assert int(state["step"]) == 7

    train_steps = [s for s, m in logged if "train/loss" in m]
    val_steps = [s for s, m in logged if "val/loss" in m]
    assert train_steps == [2, 4, 6, 7], train_steps
    # val at the 4-boundary plus exactly one final val at max_steps
    assert val_steps == [4, 7], val_steps

    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(str(tmp_path / "ck"))
    assert mngr.latest_step() == 7
