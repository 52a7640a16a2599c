"""One-command CREPE pretrained-weights activation (VERDICT r2 #7).

The reference's primary F0 extractor is pretrained torchcrepe
(reference data/utils/f0_extraction.py:16-57). This environment has no
network access, so the weights cannot ship with the repo; the moment
you have a torchcrepe ``full.pth`` (or ``tiny.pth``) this script makes
everything downstream work with zero edits:

    # 1. on any machine with network access:
    #    https://github.com/maxrmorrison/torchcrepe
    #    -> torchcrepe/assets/full.pth
    # 2. here:
    python scripts/convert_crepe.py --weights /path/to/full.pth
    export CREPE_WEIGHTS=/path/to/full.jax.npz   # printed by the script

It converts the torch state dict to this package's parameter pytree,
caches it as a flat .npz (reloadable without torch), and runs the A4
pitch-tracking sanity check from tests/test_crepe.py — the same check
the skip-gated integration test applies. With $CREPE_WEIGHTS set, both
that test and ``create_dataset.py --f0-extractor crepe`` activate.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np


@click.command()
@click.option("--weights", required=True,
              help="Path to a torchcrepe .pth state-dict file")
@click.option("--capacity", default="full", type=click.Choice(["full", "tiny"]))
@click.option("--output", default="",
              help="Cache path (default: <weights>.jax.npz)")
@click.option("--skip-check", is_flag=True,
              help="Convert + cache only (no TPU/model sanity run)")
def main(weights, capacity, output, skip_check):
    import jax
    import jax.numpy as jnp

    from neural_waveshaping_synthesis_tpu.models import crepe

    if not os.path.exists(weights):
        raise click.ClickException(f"weights file not found: {weights}")
    output = output or os.path.splitext(weights)[0] + ".jax.npz"

    params = crepe.load_torchcrepe_weights(weights)
    n_tensors = sum(len(l) for l in params["layers"]) + len(params["classifier"])
    crepe.save_params_npz(params, output)
    print(f"converted {n_tensors} tensors -> {output}")

    if not skip_check:
        model = crepe.Crepe(capacity=capacity)
        jparams = jax.tree_util.tree_map(jnp.asarray, params)
        t = np.arange(16000) / 16000.0
        audio = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        f0, conf = crepe.predict(model, jparams, audio)
        interior = slice(5, -5)
        cents = 1200 * np.abs(np.log2(f0[interior] / 440.0))
        med, c = float(np.median(cents)), float(conf[interior].mean())
        ok = med < 10.0 and c > 0.7
        print(
            f"A4 sanity check: median error {med:.2f} cents, mean "
            f"periodicity {c:.3f} -> {'OK' if ok else 'FAILED'}"
        )
        if not ok:
            raise click.ClickException(
                "pretrained sanity check failed — wrong capacity for this "
                "file, or not a torchcrepe state dict"
            )

    print("\nTo activate the CREPE path everywhere:")
    print(f"  export CREPE_WEIGHTS={os.path.abspath(output)}")
    print("  # create_dataset.py --f0-extractor crepe now works, and")
    print("  # tests/test_crepe.py::test_pretrained_full_tracks_pitch un-skips")


if __name__ == "__main__":
    main()
