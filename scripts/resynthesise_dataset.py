"""Batch resynthesis of a dataset split, writing <name>.target.wav /
<name>.output.wav pairs (reference scripts/resynthesise_dataset.py —
which ships broken: it imports a nonexistent URMPDataset (its :9,41);
this implements the evident intent with GeneralDataset).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np

from neural_waveshaping_synthesis_tpu import minigin as gin
from neural_waveshaping_synthesis_tpu.utils import write_wav


@click.command()
@click.option("--gin-file", multiple=True, default=("gin/models/newt.gin",))
@click.option("--gin-binding", "-b", multiple=True,
              help="Extra gin bindings applied after the files")
@click.option("--dataset-path", required=True)
@click.option("--instrument", default="", help="URMP instrument subdir (optional)")
@click.option("--split", default="test")
@click.option("--checkpoint", required=True,
              help="orbax checkpoint dir OR a reference PL .ckpt file")
@click.option("--output-path", required=True)
@click.option("--batch-size", default=8)
@click.option("--use-fast-newt", is_flag=True,
              help="Swap the shaper bank for the baked lookup table")
@click.option("--step", default=None, type=int,
              help="Checkpoint step to load (orbax dirs; default: the "
                   "best-on-val step, falling back to the latest)")
@click.option("--seed", default=0)
def main(gin_file, gin_binding, dataset_path, instrument, split, checkpoint, output_path,
         batch_size, use_fast_newt, step, seed):
    import jax
    import jax.numpy as jnp

    from neural_waveshaping_synthesis_tpu.data import GeneralDataset
    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping

    for f in gin_file:
        gin.parse_config_file(f)
    for b in gin_binding:
        gin.parse_config(b)
    gin.validate_config()

    model = NeuralWaveshaping()
    if os.path.isfile(checkpoint):
        from neural_waveshaping_synthesis_tpu.convert import (
            load_reference_checkpoint,
        )

        params, _, _, _ = load_reference_checkpoint(checkpoint)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        from neural_waveshaping_synthesis_tpu.training import select_eval_step

        mngr, step = select_eval_step(checkpoint, step)
        if step is None:
            raise click.ClickException(f"no checkpoints in {checkpoint}")
        restored = mngr.restore(step)
        params = jax.tree_util.tree_map(jnp.asarray, restored["params"])
        print(f"[resynthesise] restored step {step} (best-on-val unless --step given)")

    root = os.path.join(dataset_path, instrument) if instrument else dataset_path
    dataset = GeneralDataset(root, split)
    os.makedirs(output_path, exist_ok=True)

    table = model.newt.bake_lookup_table(params["newt"]) if use_fast_newt else None
    fwd = jax.jit(
        lambda p, f, c, k: model.apply(p, f, c, key=k, lookup_table=table)
    )

    from neural_waveshaping_synthesis_tpu.training import (
        multi_resolution_stft_loss,
    )

    loss_fn = jax.jit(multi_resolution_stft_loss)

    sr = int(model.sample_rate)
    key = jax.random.PRNGKey(seed)
    n = len(dataset)
    per_clip = []
    for start in range(0, n, batch_size):
        true_idx = np.arange(start, min(start + batch_size, n))
        # pad the final short batch by repeating the last clip so every
        # batch reuses the same compiled program (cold compiles cost
        # minutes on this runtime); padded rows are dropped below
        idx = np.concatenate(
            [true_idx, np.full(batch_size - len(true_idx), true_idx[-1])]
        )
        batch = dataset.batch(idx)
        key, sub = jax.random.split(key)
        recon_dev = fwd(
            params, jnp.asarray(batch["f0"]), jnp.asarray(batch["control"]), sub
        )
        recon = np.asarray(recon_dev)
        # per-clip distances (equal weight regardless of batch layout)
        for row, i in enumerate(true_idx):
            per_clip.append(
                float(
                    loss_fn(
                        recon_dev[row : row + 1],
                        jnp.asarray(batch["audio"][row : row + 1]),
                    )
                )
            )
            name = dataset.names[i]
            write_wav(os.path.join(output_path, f"{name}.target.wav"),
                      batch["audio"][row], sr)
            write_wav(os.path.join(output_path, f"{name}.output.wav"),
                      recon[row], sr)
        print(f"[resynthesise] {min(start + batch_size, n)}/{n}")

    # numeric eval (the reference offers only listening comparison):
    # per-clip mean multi-resolution STFT distance
    print(
        f"[resynthesise] mean multi-res STFT distance: "
        f"{float(np.mean(per_clip)):.4f} over {n} clips"
    )


if __name__ == "__main__":
    main()
