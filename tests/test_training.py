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
def _write_synthetic_dataset(root, rng, dtype=np.float32):
    """Write a tiny reference-format dataset (SURVEY.md §2a #11 layout)."""
    tc, ta, n_ch = 25, 800, 19
    for split, n in [("train", 16), ("val", 8), ("test", 8)]:
        (root / split / "audio").mkdir(parents=True)
        (root / split / "control").mkdir(parents=True)
        for i in range(n):
            np.save(
                root / split / "audio" / f"audio_clip{i}.npy",
                (rng.standard_normal(ta) * 0.1).astype(dtype),
            )
            np.save(
                root / split / "control" / f"control_clip{i}.npy",
                rng.standard_normal((n_ch, tc)).astype(dtype),
            )
    mean = np.zeros((n_ch, 1), dtype)
    mean[0] = 150.0  # f0 denormalizes to ~150 Hz
    std = np.ones((n_ch, 1), dtype)
    std[0] = 30.0
    np.save(root / "data_mean.npy", mean)
    np.save(root / "data_std.npy", std)
    return str(root)


@pytest.fixture
def synthetic_dataset(tmp_path, rng):
    return _write_synthetic_dataset(tmp_path / "data", rng)


def test_urmp_datamodule_with_gin_batch_bindings(synthetic_dataset, tmp_path):
    """Regression: `train.py --urmp` with train_newt.gin's
    `GeneralDataModule.batch_size = 8` binding raised 'multiple values
    for batch_size' — URMPDataModule passed batch_size positionally
    into its gin-wrapped parent, colliding with the merged binding
    (found by the tpt 24k run; latent since the URMP surface landed)."""
    import shutil

    from neural_waveshaping_synthesis_tpu import minigin as gin
    from neural_waveshaping_synthesis_tpu.data import URMPDataModule

    root = tmp_path / "urmp_root"
    root.mkdir()
    shutil.copytree(synthetic_dataset, root / "tpt")
    try:
        gin.parse_config("URMPDataModule.batch_size = 8")
        gin.parse_config("GeneralDataModule.batch_size = 8")
        dm = URMPDataModule(str(root), "tpt", load_to_memory=True)
        assert dm.batch_size == 8
        b = next(iter(dm.train_batches(jax.random.PRNGKey(0))))
        assert b["audio"].shape[0] == 8
    finally:
        gin.clear_config()


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


def test_param_watching_called_at_val_cadence(synthetic_dataset, tmp_path):
    """VERDICT r2 #8: loggers exposing log_params (WandbLogger's
    parameter-histogram watch, reference scripts/train.py:62-66) receive
    HOST-side parameter pytrees at every val interval; loggers without
    the hook are untouched."""
    calls = []

    class Watcher:
        def log_metrics(self, metrics, step):
            pass

        def log_params(self, params, step):
            leaves = jax.tree_util.tree_leaves(params)
            assert all(isinstance(l, np.ndarray) for l in leaves)
            calls.append(step)

    model = tiny_model()
    cfg = TrainConfig(
        max_steps=4, val_every_n_steps=2, log_every_n_steps=2,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    dm = GeneralDataModule(synthetic_dataset, batch_size=8)
    Trainer(model, cfg, loggers=[Watcher(), ConsoleLoggerNoParams()]).fit(dm)
    assert calls == [2, 4]


class ConsoleLoggerNoParams:
    """A logger WITHOUT log_params — fit must not require the hook."""

    def log_metrics(self, metrics, step):
        pass


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


def _fit_trajectory(n_dev, dataset_path, work_dir, lazy, max_steps=100,
                    resume_steps=120, initial_params=None):
    """Run a complete Trainer.fit (val cadence + checkpoint rotation),
    then a resume, on an n_dev mesh; return (final_state, metrics rows)."""
    import csv
    import dataclasses as dc

    tag = f"mesh{n_dev}_{'lazy' if lazy else 'fast'}"
    ckpt_dir = os.path.join(work_dir, f"ck_{tag}")
    log_dir = os.path.join(work_dir, f"log_{tag}")
    cfg = TrainConfig(
        max_steps=max_steps,
        val_every_n_steps=25,
        log_every_n_steps=5,
        checkpoint_dir=ckpt_dir,
        seed=0,
    )
    dtype = np.float64 if initial_params is not None else np.float32
    dm = GeneralDataModule(dataset_path, batch_size=8, load_to_memory=not lazy,
                           dtype=dtype)
    trainer = Trainer(
        tiny_model(), cfg, mesh=create_mesh(n_devices=n_dev),
        loggers=[CSVLogger(log_dir)],
    )
    trainer.fit(dm, initial_params=initial_params)

    cfg2 = dc.replace(cfg, max_steps=resume_steps)
    dm2 = GeneralDataModule(dataset_path, batch_size=8, load_to_memory=not lazy,
                            dtype=dtype)
    trainer2 = Trainer(
        tiny_model(), cfg2, mesh=create_mesh(n_devices=n_dev),
        loggers=[CSVLogger(log_dir)],
    )
    state = trainer2.fit(dm2, restore=True, initial_params=initial_params)

    with open(os.path.join(log_dir, "metrics.csv")) as f:
        rows = [
            (int(r["step"]), metric, float(r[metric]))
            for r in csv.DictReader(f)
            for metric in ("train/loss", "val/loss")
            if r.get(metric)
        ]
    return state, rows


def _assert_same_trajectory(rows, ref_rows, state, ref_state, what,
                            exact_horizon=5, exact_tol=2e-3,
                            row_tol=0.5, plateau_tol=0.025):
    """Structural equality is strict (same steps, same metric sequence,
    same final step). Value gates are three-tier, because bit-level
    equality across mesh sizes is mathematically unattainable at fit
    scale: different psum groupings differ by ~1e-16 relative even in
    f64, and early Adam (update ~ g/sqrt(nu), nu ~ 0) amplifies that by
    ~1e2-1e3 per step — measured per-step loss deltas 0, 0, 8e-15,
    2e-13, 2.5e-9, 2.7e-7 ... saturating into CHAOTIC trajectory
    separation at the plateau-fluctuation scale (~1e-2 relative) by
    ~step 12. Past that horizon pointwise values are draws from the
    same dynamics, re-rolled by ANY change to program bits (a 3%
    pointwise gate used here previously flaked from 0.6% to 6% on a
    value-preserving layout optimization).

    Tiers: (1) rows at step <= exact_horizon compare at exact_tol —
    near-exact semantics THROUGH the real fit orchestration, pre-
    amplification (measured step-5 deltas: mesh-2 fast 1.8e-8, mesh-8
    lazy 6.4e-5 — mesh 8 has more psum-grouping freedom and amplifies
    faster — so 2e-3 has ~30x headroom over the worst mesh while
    staying 75x sharper than tier 2; by step 10 amplification already
    reaches 1e-2);
    (2) every row compares at row_tol=50% — an explosion/divergence
    guard only: rows at steps ~8-30 land mid-descent (loss cliff
    2.3 -> 1.5), where a chaos-shifted descent TIME reads as a large
    pointwise gap (18% measured at step 10 on a legitimate mesh-8
    draw); systematic sharding bugs (wrong psum scale, missing shards)
    are instead caught by tier 1 and by
    test_multi_step_chunk_exact_across_mesh_sizes;
    (3) the plateau median (rows at step >= 50, transient-resistant)
    compares at 2.5% (measured 0.18%, ~14x headroom)."""
    assert [(s, m) for s, m, _ in rows] == [(s, m) for s, m, _ in ref_rows]
    for (s, m, v), (_, _, rv) in zip(rows, ref_rows):
        tol = exact_tol if s <= exact_horizon else row_tol
        assert abs(v - rv) <= tol * max(abs(rv), 1.0), (what, s, m, v, rv)
    med = float(np.median([v for s, _, v in rows if s >= 50]))
    ref_med = float(np.median([v for s, _, v in ref_rows if s >= 50]))
    assert abs(med - ref_med) <= plateau_tol * abs(ref_med), (
        what, med, ref_med)
    assert int(state["step"]) == int(ref_state["step"])
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state["params"]),
        jax.tree_util.tree_leaves(state["params"]),
    ):
        assert np.isfinite(np.asarray(b)).all(), what


def test_multi_step_chunk_exact_across_mesh_sizes():
    """The fit engine — make_multi_train_step's scan over pre-gathered
    sharded batches, gradient + clip + Adam included — is semantically
    EXACT across mesh sizes: in f64 the per-step losses of a 4-step
    chunk agree to <=2e-7 on meshes {1, 2, 8} — pure reduction noise
    (1e-15 at step 0) through ~3 rounds of early-Adam amplification
    (measured: step-3 delta 2e-13 on mesh 2, 2e-8 on mesh 8), still
    7+ orders below any semantic sharding bug. This is
    the strict half of VERDICT r2 #4; the fit-level test covers the
    orchestration (val cadence, checkpoints, resume) with
    amplification-aware bounds."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neural_waveshaping_synthesis_tpu.training import (
        train_state_from_params,
    )
    from neural_waveshaping_synthesis_tpu.training.trainer import (
        make_multi_train_step,
    )
    from neural_waveshaping_synthesis_tpu.parallel import replicated_sharding

    with jax.enable_x64(True):
        model = tiny_model()
        cfg = TrainConfig()
        p64 = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float64),
            jax.jit(model.init)(jax.random.PRNGKey(42)),
        )
        n_steps = 4
        batches = {
            k: np.stack(
                [make_batch(np.random.default_rng(100 + i))[k]
                 for i in range(n_steps)]
            ).astype(np.float64)
            for k in ("audio", "f0", "control")
        }
        key = jax.random.PRNGKey(7)
        losses = {}
        for n_dev in (1, 2, 8):
            mesh = create_mesh(n_devices=n_dev)
            rep = replicated_sharding(mesh)
            chunk_sh = {k: NamedSharding(mesh, P(None, "data"))
                        for k in batches}
            ms = jax.jit(
                make_multi_train_step(model, cfg),
                in_shardings=(rep, chunk_sh, rep),
                out_shardings=(rep, rep),
            )
            state = jax.device_put(train_state_from_params(p64, cfg), rep)
            b = {k: jax.device_put(v, chunk_sh[k]) for k, v in batches.items()}
            _, l = ms(state, b, jax.device_put(key, rep))
            losses[n_dev] = np.asarray(l)
        for n_dev in (2, 8):
            np.testing.assert_allclose(
                losses[n_dev], losses[1], rtol=0, atol=2e-7,
                err_msg=f"mesh {n_dev}")


@pytest.mark.slow
def test_fit_level_equivalence_across_mesh_sizes(tmp_path, rng):
    """VERDICT r2 #4: a COMPLETE fit — 100 steps with val every 25,
    best-2+last checkpoint rotation, then resume to 120 — must produce
    the same loss trajectory (same step/metric structure, values within
    the amplification-aware gate of _assert_same_trajectory) on meshes
    {1, 2, 8} (chunked fast path) and {1, 8} (lazy/buffered path).

    Runs END-TO-END in float64: x64 mode, f64 initial params (threaded
    through Trainer.fit's initial_params) AND an f64-on-disk dataset
    (GeneralDataModule dtype). Both f64 conditions are load-bearing:
    with f32 batch data the sharded program reassociates f32 ops
    (measured 4.8e-7 loss difference on the very first forward), and
    with f32-pinned dot accumulators the WEIGHT-GRADIENT contraction
    over the sharded batch axis reassociated in f32 too (measured
    ~1e-6 normalized grad drift; fixed by modules._acc_dtype) — either
    would add mesh-dependent noise far above the f64 floor."""
    with jax.enable_x64(True):
        dataset64 = _write_synthetic_dataset(
            tmp_path / "data64", rng, dtype=np.float64)
        # host-side numpy leaves: the trainer donates its state buffers,
        # so device-array initial params would be deleted by the first
        # fit and unusable for the later meshes
        p64 = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float64),
            jax.jit(tiny_model().init)(jax.random.PRNGKey(42)),
        )

        # chunked fast path (device-resident data, scan chunks of 25)
        ref_state, ref_rows = _fit_trajectory(
            1, dataset64, str(tmp_path), lazy=False,
            initial_params=p64)
        assert int(ref_state["step"]) == 120
        assert any(m == "val/loss" for _, m, _ in ref_rows)
        for n_dev in (2, 8):
            state, rows = _fit_trajectory(
                n_dev, dataset64, str(tmp_path), lazy=False,
                initial_params=p64)
            _assert_same_trajectory(rows, ref_rows, state, ref_state,
                                    f"mesh {n_dev} fast path")

        # lazy/buffered path (host batches chunked through the same scan)
        lazy_ref_state, lazy_ref_rows = _fit_trajectory(
            1, dataset64, str(tmp_path), lazy=True,
            initial_params=p64)
        assert int(lazy_ref_state["step"]) == 120
        state, rows = _fit_trajectory(
            8, dataset64, str(tmp_path), lazy=True,
            initial_params=p64)
        _assert_same_trajectory(rows, lazy_ref_rows, state, lazy_ref_state,
                                "mesh 8 lazy path")
