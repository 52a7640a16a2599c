"""Train a NEWT model (CLI parity with reference scripts/train.py:20-77).

Example:
    python scripts/train.py --gin-file gin/train/train_newt.gin \
        --dataset-path /data/urmp_processed --urmp --instrument vn

The PL Trainer's responsibilities (loop, DP, checkpointing, resume,
logging) are provided by neural_waveshaping_synthesis_tpu.training.
``--device`` selects how many TPU devices join the data-parallel mesh
(default: all; reference used it as a GPU index).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click

from neural_waveshaping_synthesis_tpu import minigin as gin
from neural_waveshaping_synthesis_tpu.data import GeneralDataModule, URMPDataModule
from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping
from neural_waveshaping_synthesis_tpu.parallel import create_mesh
from neural_waveshaping_synthesis_tpu.training import (
    ConsoleLogger,
    CSVLogger,
    TrainConfig,
    Trainer,
)


@gin.configurable
def get_model(model=NeuralWaveshaping):
    return model()


@click.command()
@click.option("--gin-file", multiple=True, default=("gin/train/train_newt.gin",))
@click.option("--gin-binding", "-b", multiple=True,
              help="Extra gin bindings applied after the files, e.g. "
                   "'TrainConfig.max_steps = 2000' or "
                   "\"NeuralWaveshaping.compute_dtype = 'bfloat16'\"")
@click.option("--dataset-path", required=True, help="Dataset root directory")
@click.option("--urmp", is_flag=True, help="dataset-path is a URMP root with per-instrument subdirs")
@click.option("--device", default=None, type=int, help="Number of TPU devices for the data-parallel mesh (default: all)")
@click.option("--instrument", default="vn")
@click.option("--load-data-to-memory/--no-load-data-to-memory", default=True,
              help="Lazy per-batch shard loading when off (large corpora). "
                   "Lazy batches stream in scan-sized chunks (one device "
                   "dispatch per chunk), slower than the fully on-device "
                   "fast path but far from the old per-step cliff. Keep "
                   "on unless the corpus exceeds host memory.")
@click.option("--with-wandb", is_flag=True)
@click.option("--restore-checkpoint", is_flag=True, help="Resume from the latest checkpoint in TrainConfig.checkpoint_dir")
@click.option("--checkpoint-dir", default=None, help="Override TrainConfig.checkpoint_dir")
@click.option("--log-dir", default="logs", help="CSV/audio log directory")
@click.option("--from-torch-checkpoint", default="", help="Initialize params from a converted reference .ckpt (fine-tune)")
def main(
    gin_file,
    gin_binding,
    dataset_path,
    urmp,
    device,
    instrument,
    load_data_to_memory,
    with_wandb,
    restore_checkpoint,
    checkpoint_dir,
    log_dir,
    from_torch_checkpoint,
):
    for f in gin_file:
        gin.parse_config_file(f)
    for b in gin_binding:
        gin.parse_config(b)
    gin.validate_config()

    model = get_model()
    cfg_kwargs = {}
    if checkpoint_dir:
        cfg_kwargs["checkpoint_dir"] = checkpoint_dir
    cfg = TrainConfig(**cfg_kwargs)

    if urmp:
        data = URMPDataModule(
            dataset_path, instrument, load_to_memory=load_data_to_memory
        )
    else:
        data = GeneralDataModule(dataset_path, load_to_memory=load_data_to_memory)

    loggers = [ConsoleLogger(), CSVLogger(log_dir)]
    if with_wandb:
        from neural_waveshaping_synthesis_tpu.training import WandbLogger

        loggers.append(WandbLogger())

    mesh = create_mesh(n_devices=device)
    print(
        f"[train] data-parallel over {mesh.shape['data']} device(s); "
        f"max_steps={cfg.max_steps} batch={data.batch_size}"
    )
    print(gin.operative_config_str())

    initial_params = None
    if from_torch_checkpoint:
        import jax.numpy as jnp
        import jax

        from neural_waveshaping_synthesis_tpu.convert import (
            load_reference_checkpoint,
        )

        initial_params, _, _, _ = load_reference_checkpoint(from_torch_checkpoint)
        initial_params = jax.tree_util.tree_map(jnp.asarray, initial_params)

    trainer = Trainer(model, cfg, mesh=mesh, loggers=loggers)
    _start_hang_watchdog(trainer)
    try:
        state = trainer.fit(
            data, restore=restore_checkpoint, initial_params=initial_params
        )
    except Exception as e:  # noqa: BLE001
        if _is_recoverable_device_failure(e):
            _restart_after_device_failure(e)
        raise
    print(f"[train] finished at step {int(state['step'])}")


def _start_hang_watchdog(trainer) -> None:
    """TPU-worker crashes sometimes HANG the blocked RPC instead of
    raising (observed: training frozen in futex_wait with the process
    alive), so exception-based recovery never fires. This daemon thread
    watches the trainer's progress heartbeat and restarts the process
    from the latest checkpoint when it stalls.

    The timeout must exceed the worst legitimate pause — cold remote
    compiles here run several minutes — default 900 s, tunable via
    NWS_TPU_HANG_TIMEOUT (0 disables)."""
    import threading
    import time as _time

    timeout = float(os.environ.get("NWS_TPU_HANG_TIMEOUT", "900"))
    if timeout <= 0:
        return

    def watch():
        while True:
            _time.sleep(min(60.0, timeout / 4))
            stalled = _time.time() - trainer.last_progress
            if stalled > timeout:
                _restart_after_device_failure(
                    RuntimeError(
                        f"no training progress for {stalled:.0f}s "
                        f"(hang watchdog, timeout {timeout:.0f}s)"
                    )
                )
                os._exit(3)  # reached only if restarts are exhausted

    threading.Thread(target=watch, daemon=True, name="hang-watchdog").start()


def _is_recoverable_device_failure(e: Exception) -> bool:
    """TPU worker crashes surface as UNAVAILABLE JaxRuntimeErrors; the
    worker self-recovers in ~a minute but the in-process client is dead,
    so recovery means restarting the process from the last checkpoint."""
    return "UNAVAILABLE" in str(e) or "worker process crashed" in str(e)


def _restart_after_device_failure(e: Exception) -> None:
    import sys as _sys
    import time as _time

    restarts = int(os.environ.get("NWS_TPU_RESTARTS", "0"))
    max_restarts = int(os.environ.get("NWS_TPU_MAX_RESTARTS", "3"))
    if restarts >= max_restarts:
        print(f"[train] device failed {restarts}x; giving up: {e}")
        return
    delay = float(os.environ.get("NWS_TPU_RESTART_DELAY", "75"))
    print(
        f"[train] TPU worker failure ({e}); restarting from the latest "
        f"checkpoint in ~{delay:.0f} s (attempt {restarts + 1}/{max_restarts})"
    )
    _time.sleep(delay)
    os.environ["NWS_TPU_RESTARTS"] = str(restarts + 1)
    argv = [a for a in _sys.argv]
    if "--restore-checkpoint" not in argv:
        argv.append("--restore-checkpoint")
    os.execv(_sys.executable, [_sys.executable] + argv)


if __name__ == "__main__":
    main()
