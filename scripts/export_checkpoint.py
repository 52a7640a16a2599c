"""Export a trained orbax checkpoint to the reference's PL .ckpt format
(checkpoint interchange, the reverse of --from-torch-checkpoint):

    python scripts/export_checkpoint.py --checkpoint checkpoints_tpu \
        --output my_model.ckpt --stats-from /data/processed/vn
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click


@click.command()
@click.option("--gin-file", multiple=True, default=("gin/models/newt.gin",),
              help="model config the checkpoint was trained with — its "
                   "hyperparameters are embedded in the exported .ckpt")
@click.option("--checkpoint", required=True, help="orbax checkpoint directory")
@click.option("--output", required=True, help="output .ckpt path")
@click.option("--step", default=None, type=int,
              help="Checkpoint step to export (default: the best-on-val "
                   "step, falling back to the latest)")
@click.option("--stats-from", default="",
              help="dataset dir whose data_mean/std.npy to copy next to the ckpt")
def main(gin_file, checkpoint, output, step, stats_from):
    import jax

    from neural_waveshaping_synthesis_tpu import minigin as gin
    from neural_waveshaping_synthesis_tpu.convert import save_reference_checkpoint
    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping
    from neural_waveshaping_synthesis_tpu.training import select_eval_step

    for f in gin_file:
        gin.parse_config_file(f)
    gin.validate_config()
    model = NeuralWaveshaping()
    hparams = {
        "n_waveshapers": model.n_waveshapers,
        "control_hop": model.control_hop,
        "sample_rate": model.sample_rate,
        "learning_rate": 0.001,
        "lr_decay": 0.9,
        "lr_decay_interval": 10000,
    }

    mngr, step = select_eval_step(checkpoint, step)
    if step is None:
        raise click.ClickException(f"no checkpoints in {checkpoint}")
    restored = mngr.restore(step)
    save_reference_checkpoint(restored["params"], output, hparams=hparams, step=step)
    print(f"[export] wrote {output} (step {step}, reference PL format)")

    if stats_from:
        out_dir = os.path.dirname(os.path.abspath(output))
        for stats in ("data_mean.npy", "data_std.npy"):
            src = os.path.join(stats_from, stats)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(out_dir, stats))
                print(f"[export] copied {stats}")


if __name__ == "__main__":
    main()
