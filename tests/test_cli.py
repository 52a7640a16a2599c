"""CLI smoke tests: every script's flag surface + one real run each for
the dataset builder and benchmark CLIs, forced onto the CPU platform
via NWS_TPU_PLATFORM (subprocess-level; the conftest's in-process
override doesn't reach subprocesses)."""
import os
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import wavfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def run_cli(script, *args, timeout=600):
    env = dict(os.environ, NWS_TPU_PLATFORM="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, script), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
        env=env,
    )


@pytest.mark.parametrize(
    "script",
    [
        "create_dataset.py",
        "create_urmp_dataset.py",
        "train.py",
        "resynthesise_dataset.py",
        "time_forward_pass.py",
        "profile_train_step.py",
        "profile_streaming_step.py",
        "time_buffer_sizes.py",
        "timbre_transfer.py",
        "serving_capacity.py",
    ],
)
def test_cli_help(script):
    r = run_cli(script, "--help", timeout=120)
    assert r.returncode == 0, r.stderr
    assert "--gin-file" in r.stdout


@pytest.mark.parametrize(
    "script", ["convert_crepe.py", "make_synthetic_corpus.py",
               "export_checkpoint.py", "summarize_run.py", "plot_run.py"],
)
def test_cli_help_no_gin(script):
    """Scripts without a --gin-file surface still expose a working
    --help (the CLI contract check for the non-gin tools)."""
    r = run_cli(script, "--help", timeout=120)
    assert r.returncode == 0, r.stderr
    assert "--help" in r.stdout or "Usage" in r.stdout


def test_create_dataset_cli_end_to_end(tmp_path):
    sr = 16000
    t = np.arange(9 * sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    wavfile.write(wav_dir / "tone.wav", sr, (tone * 32767).astype(np.int16))
    out = tmp_path / "out"
    r = run_cli(
        "create_dataset.py",
        "--data-directory", str(wav_dir),
        "--output-directory", str(out),
        "--f0-extractor", "yin",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out / "data_mean.npy").exists()
    n = sum(
        len(os.listdir(out / s / "audio")) for s in ("train", "val", "test")
    )
    assert n == 2  # 9 s, 4 s windows hopped 4 s


@pytest.mark.parametrize("instrument", ["vn", "tpt", "fl"])
def test_make_synthetic_corpus_instruments(tmp_path, instrument):
    """Each instrument spec renders a sane, deterministic wav: correct
    length/rate, peak-normalized to 0.6, audible RMS, and substantial
    voiced content (the preprocessing confidence filter needs voiced
    frames to keep segments at all)."""
    out = tmp_path / instrument
    r = run_cli(
        "make_synthetic_corpus.py",
        "--output-directory", str(out),
        "--n-files", "1", "--duration", "6", "--instrument", instrument,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    files = os.listdir(out)
    assert len(files) == 1
    sr, audio = wavfile.read(out / files[0])
    assert sr == 16000 and len(audio) == 6 * sr
    a = audio.astype(np.float32) / 32767.0  # int16 on disk
    peak = np.abs(a).max()
    assert 0.55 <= peak <= 0.61, peak
    assert np.sqrt((a ** 2).mean()) > 0.01
    # voiced content: most 100 ms windows carry energy
    w = a[: (len(a) // 1600) * 1600].reshape(-1, 1600)
    active = (np.abs(w).max(axis=1) > 0.05).mean()
    assert active > 0.5, active


def test_device_failure_recovery_predicate():
    sys.path.insert(0, SCRIPTS)
    try:
        from train import _is_recoverable_device_failure
    finally:
        sys.path.remove(SCRIPTS)

    assert _is_recoverable_device_failure(
        RuntimeError("UNAVAILABLE: TPU worker process crashed or restarted.")
    )
    assert not _is_recoverable_device_failure(ValueError("shape mismatch"))


def test_device_failure_restart_gives_up_at_limit(monkeypatch, capsys):
    sys.path.insert(0, SCRIPTS)
    try:
        from train import _restart_after_device_failure
    finally:
        sys.path.remove(SCRIPTS)

    monkeypatch.setenv("NWS_TPU_RESTARTS", "3")
    monkeypatch.setenv("NWS_TPU_MAX_RESTARTS", "3")
    # must NOT execv at the limit
    _restart_after_device_failure(RuntimeError("UNAVAILABLE"))
    assert "giving up" in capsys.readouterr().out


def test_time_forward_pass_cli():
    r = run_cli(
        "time_forward_pass.py",
        "--iterations", "3",
        "--length-in-seconds", "1.0",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Device-only" in r.stdout
    assert "x realtime" in r.stdout


def test_profile_train_step_cli():
    """Component profiler runs every probe end-to-end at tiny shapes
    (numbers are meaningless on CPU; this checks each probe traces,
    compiles, and executes — incl. the vjp cotangent dtypes)."""
    r = run_cli(
        "profile_train_step.py",
        "--batch-size", "1",
        "--n-frames", "20",
        "--n-short", "2",
        "--n-long", "4",
        "--repeats", "1",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for name in ("full_train_step", "model_fwd_bwd", "loss_fwd_bwd",
                 "newt_fwd_bwd", "adam_update"):
        assert name in r.stdout
    assert "full step" in r.stdout


def test_profile_streaming_step_cli():
    """Streaming component profiler runs every probe end-to-end at tiny
    shapes, incl. threading the real StreamState through the scan."""
    r = run_cli(
        "profile_streaming_step.py",
        "--batch-streams", "2",
        "--buffer-size", "256",
        "--n-short", "2",
        "--n-long", "4",
        "--repeats", "1",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for name in ("full_step", "shaper", "reverb_fdl", "noise_filter_fir"):
        assert name in r.stdout
    assert "buffer budget" in r.stdout


def test_serving_capacity_cli(tmp_path):
    """Batched-streaming capacity sweep runs end-to-end and emits the
    per-batch CSV (timings are meaningless on CPU; this checks the
    loop, the int16 wire cast, and the CSV contract)."""
    import pandas as pd

    out = tmp_path / "cap.csv"
    r = run_cli(
        "serving_capacity.py",
        "--batches", "1,2",
        "--iterations", "6",
        "--warmup", "2",
        "--fetch-int16",
        "--output-csv", str(out),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "capacity:" in r.stdout
    df = pd.read_csv(out)
    assert sorted(df.batch_streams) == [1, 2]
    assert (df.wire_dtype == "int16").all()
    assert (df.cadence_p50_ms > 0).all()
    assert (df.budget_ms == 64.0).all()


def test_urmp_file_glob(tmp_path):
    """Per-instrument stem discovery must find stems in folders that END
    with the instrument code (the reference's directory-name filter
    misses those, e.g. vc inside 01_Jupiter_vn_vc)."""
    sys.path.insert(0, SCRIPTS)
    try:
        from create_urmp_dataset import get_instrument_file_list
    finally:
        sys.path.remove(SCRIPTS)

    piece = tmp_path / "01_Jupiter_vn_vc"
    piece.mkdir()
    (piece / "AuSep_1_vn_01_Jupiter.wav").write_bytes(b"")
    (piece / "AuSep_2_vc_01_Jupiter.wav").write_bytes(b"")
    (piece / "AuMix_01_Jupiter_vn_vc.wav").write_bytes(b"")

    vn = get_instrument_file_list("vn", str(tmp_path))
    vc = get_instrument_file_list("vc", str(tmp_path))
    fl = get_instrument_file_list("fl", str(tmp_path))
    assert len(vn) == 1 and vn[0].endswith("AuSep_1_vn_01_Jupiter.wav")
    assert len(vc) == 1 and "AuSep_2_vc" in vc[0]
    assert fl == []


def test_hang_watchdog_fires(tmp_path):
    """A stalled heartbeat must trigger the restart path (driven in a
    subprocess with restarts exhausted so it prints give-up and exits)."""
    script = tmp_path / "drive_watchdog.py"
    script.write_text(
        "import os, sys, time\n"
        f"sys.path.insert(0, {REPO!r}); sys.path.insert(0, {SCRIPTS!r})\n"
        "os.environ['NWS_TPU_PLATFORM'] = 'cpu'\n"
        "os.environ['NWS_TPU_HANG_TIMEOUT'] = '2'\n"
        "os.environ['NWS_TPU_RESTARTS'] = '3'\n"  # at limit: no execv
        "from train import _start_hang_watchdog\n"
        "class T: last_progress = time.time() - 100\n"
        "_start_hang_watchdog(T())\n"
        "time.sleep(8)\n"
        "print('watchdog never fired')\n"
    )
    r = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True, timeout=120
    )
    assert "giving up" in r.stdout, (r.stdout, r.stderr)
    assert r.returncode == 3
    assert "watchdog never fired" not in r.stdout


def test_create_dataset_cli_crepe_extractor(tmp_path):
    """The reference's primary dataset path (create_dataset with CREPE
    f0 + Viterbi) driven end-to-end through the CLI. No pretrained
    weights exist in this environment, so the run uses oracle-random
    tiny-capacity weights saved in torchcrepe's .pth layout — exercising
    weight conversion, the batched CNN, Viterbi decode, and the shard
    writer; the confidence filter is disabled because random weights
    produce meaningless confidences."""
    import torch

    rng = np.random.default_rng(0)
    filters = [4 * f for f in (32, 4, 4, 4, 8, 16)]
    widths = (512, 64, 64, 64, 64, 64)
    sd, in_ch = {}, 1
    for i, (out_ch, w) in enumerate(zip(filters, widths), start=1):
        sd[f"conv{i}.weight"] = torch.tensor(
            rng.standard_normal((out_ch, in_ch, w, 1)).astype(np.float32) * 0.05)
        sd[f"conv{i}.bias"] = torch.tensor(np.zeros(out_ch, np.float32))
        sd[f"conv{i}_BN.weight"] = torch.tensor(np.ones(out_ch, np.float32))
        sd[f"conv{i}_BN.bias"] = torch.tensor(np.zeros(out_ch, np.float32))
        sd[f"conv{i}_BN.running_mean"] = torch.tensor(np.zeros(out_ch, np.float32))
        sd[f"conv{i}_BN.running_var"] = torch.tensor(np.ones(out_ch, np.float32))
        in_ch = out_ch
    sd["classifier.weight"] = torch.tensor(
        rng.standard_normal((360, 4 * filters[-1])).astype(np.float32) * 0.05)
    sd["classifier.bias"] = torch.tensor(np.zeros(360, np.float32))
    weights = tmp_path / "crepe_tiny_random.pth"
    torch.save(sd, weights)

    sr = 16000
    t = np.arange(5 * sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    wavfile.write(wav_dir / "tone.wav", sr, (tone * 32767).astype(np.int16))

    out = tmp_path / "out"
    r = run_cli(
        "create_dataset.py",
        "--data-directory", str(wav_dir),
        "--output-directory", str(out),
        "--f0-extractor", "crepe",
        "--crepe-weights", str(weights),
        "-b", "extract_f0_with_crepe.full_model = False",
        "-b", "preprocess_audio.confidence_threshold = -1.0",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    n = sum(
        len(os.listdir(out / s / "audio")) for s in ("train", "val", "test")
    )
    assert n == 1  # 5 s -> one 4 s window, filter disabled


def test_export_checkpoint_cli_roundtrip(tmp_path):
    """Train-side orbax checkpoint -> export CLI -> reference PL .ckpt ->
    converter reload: every tensor must survive the full interchange."""
    import jax

    from neural_waveshaping_synthesis_tpu.convert import load_reference_checkpoint
    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping
    from neural_waveshaping_synthesis_tpu.training import (
        TrainConfig,
        init_train_state,
    )
    import orbax.checkpoint as ocp

    model = NeuralWaveshaping()
    state = init_train_state(model, TrainConfig(), jax.random.PRNGKey(0))
    ck_dir = tmp_path / "ck"
    mngr = ocp.CheckpointManager(str(ck_dir))
    mngr.save(3, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()

    out = tmp_path / "exported.ckpt"
    r = run_cli(
        "export_checkpoint.py",
        "--checkpoint", str(ck_dir),
        "--output", str(out),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()

    params2, hparams, _, _ = load_reference_checkpoint(str(out))
    assert hparams["n_waveshapers"] == 64
    leaves1 = jax.tree_util.tree_leaves(state["params"])
    leaves2 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, params2)
    )
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)


def test_create_urmp_dataset_cli_end_to_end(tmp_path):
    """Full URMP-layout pipeline: a synthetic two-instrument piece tree ->
    per-instrument dataset dirs -> loadable by the URMP datamodule."""
    sr = 16000
    t = np.arange(9 * sr) / sr
    piece = tmp_path / "urmp" / "01_Piece_vn_vc"
    piece.mkdir(parents=True)
    for name, hz in [("AuSep_1_vn_01_Piece.wav", 440.0),
                     ("AuSep_2_vc_01_Piece.wav", 110.0)]:
        tone = (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)
        wavfile.write(piece / name, sr, (tone * 32767).astype(np.int16))
    # a mix file that must NOT be picked up
    wavfile.write(piece / "AuMix_01_Piece_vn_vc.wav", sr,
                  np.zeros(sr, np.int16))

    out = tmp_path / "processed"
    r = run_cli(
        "create_urmp_dataset.py",
        "--data-directory", str(tmp_path / "urmp"),
        "--output-directory", str(out),
        "--instruments", "vn,vc",
        "--f0-extractor", "yin",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for ins in ("vn", "vc"):
        n = sum(
            len(os.listdir(out / ins / s / "audio"))
            for s in ("train", "val", "test")
        )
        assert n == 2, (ins, n)  # 9 s tone -> two 4 s windows

    from neural_waveshaping_synthesis_tpu.data import URMPDataModule

    dm = URMPDataModule(str(out), "vn", batch_size=1)
    import jax

    batch = next(iter(dm.train_batches(jax.random.PRNGKey(0))))
    assert batch["audio"].shape[1] == 64000
    assert 380 < float(batch["f0"].mean()) < 500  # vn tone at 440 Hz


def test_summarize_run_handles_resumed_log(tmp_path):
    """A resume appends re-logged steps to metrics.csv; the summary must
    dedup by step (last lineage wins), count the restart, and exclude
    dead time between segments from the wall-clock figure."""
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    rows = ["step,time,train/loss,train/lr,train/steps_per_sec,val/loss,test/loss,grad_norm"]
    # segment 1: steps 100..400 over 30 s, then a crash and a 10-min gap
    for i, step in enumerate([100, 200, 300, 400]):
        rows.append(f"{step},{1000 + 10 * i},9.{step},0.001,7.4,,,")
    rows.append("400,1031,,,,2.5,,")  # val row at step 400
    # segment 2 (resumed from 200): re-logs 300..600 starting 600 s later
    for i, step in enumerate([300, 400, 500, 600]):
        rows.append(f"{step},{1650 + 10 * i},1.{step},0.001,7.4,,,")
    rows.append("600,1681,,,,2.0,,")
    (log_dir / "metrics.csv").write_text("\n".join(rows) + "\n")

    out = tmp_path / "report"
    r = run_cli("summarize_run.py", "--log-dir", str(log_dir), "--out", str(out))
    assert r.returncode == 0, r.stderr[-2000:]
    report = (out / "run_summary.md").read_text()
    assert "up to **600**" in report
    assert "restarts" in report and "**1**" in report
    # dedup: the re-logged step 300 must use the resumed lineage's loss
    assert "1.300" in report.replace("1.3000", "1.300")
    # wall-clock sums segment spans (30 s + 31 s), not the 10-min gap
    assert "0.02 h" in report
    # final val comes from the resumed lineage
    assert "2.0000" in report
