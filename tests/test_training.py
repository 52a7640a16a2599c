"""Training runtime tests: loss parity, schedule, data-parallel step on a
virtual 8-device mesh, checkpoint save/restore, datamodule round-trip."""
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from neural_waveshaping_synthesis_tpu.data import GeneralDataModule
from neural_waveshaping_synthesis_tpu.models import (
    ControlModule,
    FIRNoiseSynth,
    HarmonicOscillator,
    NEWT,
    NeuralWaveshaping,
    Reverb,
    TimeDistributedMLP,
)
from neural_waveshaping_synthesis_tpu.parallel import create_mesh
from neural_waveshaping_synthesis_tpu.training import (
    TrainConfig,
    Trainer,
    make_lr_schedule,
    multi_resolution_stft_loss,
)
from neural_waveshaping_synthesis_tpu.training.logging import CSVLogger


def tiny_model() -> NeuralWaveshaping:
    """A miniature NEWT so CPU tests stay fast; same graph topology."""
    return NeuralWaveshaping(
        n_waveshapers=8,
        control_hop=32,
        sample_rate=4000,
        embedding=ControlModule(2, 32, 32),
        osc=HarmonicOscillator(n_harmonics=16, sample_rate=4000),
        newt=NEWT(
            n_waveshapers=8,
            control_embedding_size=32,
            shaping_fn_size=4,
            shaping_fn_depth=3,
        ),
        noise_mlp=TimeDistributedMLP(32, 32, 17, depth=3),
        noise_synth=FIRNoiseSynth(ir_length=32, hop_length=32),
        reverb=Reverb(length_in_seconds=1, sr=4000),
    )


def make_batch(rng, b=8, tc=25):
    return {
        "audio": (rng.standard_normal((b, tc * 32)) * 0.1).astype(np.float32),
        "f0": (100.0 + 50.0 * rng.random((b, tc))).astype(np.float32),
        "control": rng.standard_normal((b, tc, 2)).astype(np.float32),
    }


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------
def test_mrstft_loss_matches_auraloss_defaults(rng):
    """Parity with the auraloss-0.2.1 default formula, rebuilt from stock
    torch ops in this test."""
    x = rng.standard_normal((2, 8000)).astype(np.float32) * 0.3
    y = rng.standard_normal((2, 8000)).astype(np.float32) * 0.3
    ours = float(multi_resolution_stft_loss(jnp.asarray(x), jnp.asarray(y)))

    total = 0.0
    for n_fft, hop, win in [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]:
        w = torch.hann_window(win)
        xs = torch.stft(torch.tensor(x), n_fft, hop, win, w, return_complex=True)
        ys = torch.stft(torch.tensor(y), n_fft, hop, win, w, return_complex=True)
        xm = torch.sqrt(torch.clamp(xs.real**2 + xs.imag**2, min=1e-8))
        ym = torch.sqrt(torch.clamp(ys.real**2 + ys.imag**2, min=1e-8))
        sc = torch.norm(ym - xm) / torch.norm(ym)
        lm = torch.mean(torch.abs(torch.log(ym) - torch.log(xm)))
        total += float(sc + lm)
    ref = total / 3
    np.testing.assert_allclose(ours, ref, rtol=1e-3)


def test_loss_zero_for_identical():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4000)), jnp.float32)
    assert float(multi_resolution_stft_loss(x, x)) == 0.0


# ---------------------------------------------------------------------------
# schedule / optimizer
# ---------------------------------------------------------------------------
def test_lr_schedule_staircase():
    sched = make_lr_schedule(TrainConfig())
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(9999)) == pytest.approx(1e-3)
    assert float(sched(10000)) == pytest.approx(9e-4)
    assert float(sched(20000)) == pytest.approx(8.1e-4)


# ---------------------------------------------------------------------------
# data-parallel training step on the virtual 8-device mesh
# ---------------------------------------------------------------------------
def test_train_step_runs_data_parallel(rng):
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    model = tiny_model()
    cfg = TrainConfig(max_steps=3, val_every_n_steps=100, log_every_n_steps=100)
    mesh = create_mesh()
    assert mesh.shape["data"] == 8
    trainer = Trainer(model, cfg, mesh=mesh)

    from neural_waveshaping_synthesis_tpu.training import init_train_state
    from neural_waveshaping_synthesis_tpu.parallel import shard_batch, replicated_sharding

    state = jax.device_put(
        init_train_state(model, cfg, jax.random.PRNGKey(0)),
        replicated_sharding(mesh),
    )
    batch = shard_batch(make_batch(rng), mesh)
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        state, metrics = trainer._train_step(state, batch, key)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state["step"]) == 3
    # overfitting a single batch must reduce the loss
    assert losses[-1] < losses[0]


def test_gradients_identical_across_dp_shards(rng):
    """Data parallelism must be semantically identical to single-device:
    same global batch => same loss and gradients. Runs in float64 so
    reduction-order noise can't mask (or fake) a semantic difference —
    in f32 the same comparison shows up to ~1e-3 normalized drift
    purely from 8-way psum ordering."""
    from neural_waveshaping_synthesis_tpu.training import (
        compute_loss,
        init_train_state,
    )
    from neural_waveshaping_synthesis_tpu.parallel import (
        batch_sharding,
        replicated_sharding,
        shard_batch,
    )

    with jax.enable_x64(True):
        model = tiny_model()
        batch = {
            k: v.astype(np.float64) for k, v in make_batch(rng).items()
        }
        key = jax.random.PRNGKey(3)
        params = init_train_state(model, TrainConfig(), jax.random.PRNGKey(0))[
            "params"
        ]
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float64), params
        )
        grad_fn = jax.value_and_grad(lambda p, b: compute_loss(model, p, b, key))

        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        loss_s, grads_s = jax.jit(grad_fn)(params, jbatch)

        mesh = create_mesh()
        rep, data = replicated_sharding(mesh), batch_sharding(mesh)
        dp_fn = jax.jit(
            grad_fn,
            in_shardings=(rep, {"audio": data, "f0": data, "control": data}),
            out_shardings=(rep, rep),
        )
        loss_d, grads_d = dp_fn(
            jax.device_put(params, rep), shard_batch(batch, mesh)
        )

        np.testing.assert_allclose(float(loss_s), float(loss_d), rtol=1e-9)
        for a, b in zip(
            jax.tree_util.tree_leaves(grads_s), jax.tree_util.tree_leaves(grads_d)
        ):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-5)


# ---------------------------------------------------------------------------
# datamodule + end-to-end fit with checkpointing
# ---------------------------------------------------------------------------
@pytest.fixture
def synthetic_dataset(tmp_path, rng):
    """Write a tiny reference-format dataset (SURVEY.md §2a #11 layout)."""
    root = tmp_path / "data"
    tc, ta, n_ch = 25, 800, 19
    for split, n in [("train", 16), ("val", 8), ("test", 8)]:
        (root / split / "audio").mkdir(parents=True)
        (root / split / "control").mkdir(parents=True)
        for i in range(n):
            np.save(
                root / split / "audio" / f"audio_clip{i}.npy",
                (rng.standard_normal(ta) * 0.1).astype(np.float32),
            )
            np.save(
                root / split / "control" / f"control_clip{i}.npy",
                rng.standard_normal((n_ch, tc)).astype(np.float32),
            )
    mean = np.zeros((n_ch, 1), np.float32)
    mean[0] = 150.0  # f0 denormalizes to ~150 Hz
    std = np.ones((n_ch, 1), np.float32)
    std[0] = 30.0
    np.save(root / "data_mean.npy", mean)
    np.save(root / "data_std.npy", std)
    return str(root)


def test_datamodule_shapes_and_denorm(synthetic_dataset):
    dm = GeneralDataModule(synthetic_dataset, batch_size=4)
    batches = list(dm.train_batches(jax.random.PRNGKey(0)))
    assert len(batches) == 4  # 16 / 4
    b = batches[0]
    assert b["audio"].shape == (4, 800)
    assert b["f0"].shape == (4, 25)
    assert b["control"].shape == (4, 25, 19)
    # f0 denormalized into a plausible Hz range
    assert 0 < b["f0"].mean() < 400

    item = dm.dataset("train")[0]
    assert item["name"].startswith("clip")


def test_fit_and_resume(synthetic_dataset, tmp_path):
    model = tiny_model()
    ckpt_dir = str(tmp_path / "ckpts")
    cfg = TrainConfig(
        max_steps=4,
        val_every_n_steps=2,
        log_every_n_steps=2,
        checkpoint_dir=ckpt_dir,
    )
    dm = GeneralDataModule(synthetic_dataset, batch_size=8)
    logger = CSVLogger(str(tmp_path / "logs"))
    trainer = Trainer(model, cfg, loggers=[logger])
    state = trainer.fit(dm)
    assert int(state["step"]) == 4
    assert os.path.exists(os.path.join(str(tmp_path / "logs"), "metrics.csv"))
    # audio snapshots logged
    assert os.listdir(os.path.join(str(tmp_path / "logs"), "audio"))

    # resume: a fresh trainer restores step 4 and continues to 6
    cfg2 = TrainConfig(
        max_steps=6,
        val_every_n_steps=2,
        log_every_n_steps=2,
        checkpoint_dir=ckpt_dir,
    )
    trainer2 = Trainer(model, cfg2, loggers=[logger])
    state2 = trainer2.fit(dm, restore=True)
    assert int(state2["step"]) == 6

    test_loss = trainer2.test(state2, dm)
    assert np.isfinite(test_loss)

    # the PL save_last contract: a `last/` save exists at the final step
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))


def test_resume_prefers_last_over_stale_best(tmp_path):
    """Crash-resume regression (the 120k run died with only a 27k-steps-
    stale best checkpoint on disk): when val loss got WORSE after the
    best save, `last/` holds a newer step than the best-on-val set, and
    restore must pick the newest step — the reference's PL behavior of
    resuming from last.ckpt, not best."""
    from neural_waveshaping_synthesis_tpu.training import init_train_state

    model = tiny_model()
    cfg = TrainConfig(
        max_steps=4, checkpoint_dir=str(tmp_path / "ck"), keep_n_checkpoints=1
    )
    trainer = Trainer(model, cfg)
    manager = trainer._ckpt_manager(cfg.checkpoint_dir)

    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    state["step"] = jnp.asarray(2, state["step"].dtype)
    trainer.save_checkpoint(manager, state, val_loss=1.0)
    state["step"] = jnp.asarray(4, state["step"].dtype)
    trainer.save_checkpoint(manager, state, val_loss=2.0)  # worse: best stays at 2
    for m in manager:
        m.wait_until_finished()

    best, last = manager
    assert best.latest_step() == 2  # keep-1 best-on-val retained the better step
    assert last.latest_step() == 4

    # a fresh manager pair (new process) restores the newest step, 4
    trainer2 = Trainer(model, cfg)
    manager2 = trainer2._ckpt_manager(cfg.checkpoint_dir)
    fresh = init_train_state(model, cfg, jax.random.PRNGKey(1))
    restored, step = trainer2.restore_checkpoint(manager2, fresh)
    assert step == 4
    assert int(restored["step"]) == 4


def test_select_eval_step_prefers_best_on_val(tmp_path):
    """Eval/export CLIs must load the BEST-on-val step (PL convention of
    evaluating best.ckpt), not the highest-numbered retained save —
    with keep-2 rotation the latest retained step is usually the
    second-best, which is what a naive latest_step() hands back (this
    mislabeled a full training run's eval until caught)."""
    from neural_waveshaping_synthesis_tpu.training import (
        init_train_state,
        select_eval_step,
    )

    model = tiny_model()
    cfg = TrainConfig(
        max_steps=4, checkpoint_dir=str(tmp_path / "ck"), keep_n_checkpoints=2
    )
    trainer = Trainer(model, cfg)
    manager = trainer._ckpt_manager(cfg.checkpoint_dir)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    state["step"] = jnp.asarray(2, state["step"].dtype)
    trainer.save_checkpoint(manager, state, val_loss=1.0)
    state["step"] = jnp.asarray(4, state["step"].dtype)
    trainer.save_checkpoint(manager, state, val_loss=2.0)  # worse but newer
    for m in manager:
        m.wait_until_finished()

    _, step = select_eval_step(cfg.checkpoint_dir)
    assert step == 2  # best-on-val, not latest
    _, step = select_eval_step(cfg.checkpoint_dir, 4)
    assert step == 4  # explicit step wins


def test_dp_equivalence_realistic_scale_across_mesh_sizes(rng):
    """VERDICT r1 #6: the FULL-SIZE model at the reference's training
    shapes (batch 8 x 500 control frames = 4 s clips) must produce the
    same loss and gradients on meshes of 1, 2, and 8 devices. f32 —
    differences beyond psum reduction-order noise (~1e-3 normalized)
    indicate a sharding bug, which is what this guards. The strict
    float64 semantic check lives in
    test_gradients_identical_across_dp_shards (tiny model)."""
    from neural_waveshaping_synthesis_tpu.training import (
        compute_loss,
        init_train_state,
    )
    from neural_waveshaping_synthesis_tpu.parallel import (
        batch_sharding,
        replicated_sharding,
        shard_batch,
    )

    model = NeuralWaveshaping()  # full flagship config
    b, tc = 8, 500
    batch = {
        "audio": (rng.standard_normal((b, tc * 128)) * 0.1).astype(np.float32),
        "f0": (220.0 * 2 ** rng.uniform(0, 1, (b, tc))).astype(np.float32),
        "control": rng.standard_normal((b, tc, 2)).astype(np.float32),
    }
    key = jax.random.PRNGKey(3)
    params = init_train_state(model, TrainConfig(), jax.random.PRNGKey(0))["params"]
    grad_fn = jax.value_and_grad(lambda p, bt: compute_loss(model, p, bt, key))

    results = {}
    for n_dev in (1, 2, 8):
        mesh = create_mesh(n_devices=n_dev)
        rep, data = replicated_sharding(mesh), batch_sharding(mesh)
        fn = jax.jit(
            grad_fn,
            in_shardings=(rep, {"audio": data, "f0": data, "control": data}),
            out_shardings=(rep, rep),
        )
        loss, grads = fn(jax.device_put(params, rep), shard_batch(batch, mesh))
        results[n_dev] = (float(loss), jax.tree_util.tree_leaves(grads))

    loss_1, grads_1 = results[1]
    for n_dev in (2, 8):
        loss_n, grads_n = results[n_dev]
        assert abs(loss_n - loss_1) / abs(loss_1) < 2e-3, (loss_1, loss_n)
        for a, g in zip(grads_1, grads_n):
            a, g = np.asarray(a), np.asarray(g)
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(a / scale, g / scale, atol=5e-3)
