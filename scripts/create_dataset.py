"""Build a dataset from a directory of wav files
(reference scripts/create_dataset.py:14-27).

Example:
    python scripts/create_dataset.py \
        --gin-file gin/data/urmp_4second_crepe.gin \
        --data-directory /data/wavs --output-directory /data/processed \
        --f0-extractor yin
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click

from neural_waveshaping_synthesis_tpu import minigin as gin
from neural_waveshaping_synthesis_tpu.data.preprocess import create_dataset
from neural_waveshaping_synthesis_tpu.utils import seed_all


def select_f0_extractor(name: str) -> None:
    """Bind preprocess_audio.f0_extractor from a CLI shorthand, overriding
    the gin file (the reference hardwires crepe in its gin; we expose the
    choice because CREPE needs a pretrained weight file)."""
    if name:
        gin.parse_config(
            f"preprocess_audio.f0_extractor = @extract_f0_with_{name}"
        )


@click.command()
@click.option("--gin-file", multiple=True, default=("gin/data/urmp_4second_crepe.gin",))
@click.option("--gin-binding", "-b", multiple=True,
              help="Extra gin bindings applied after the files")
@click.option("--data-directory", prompt="Data directory")
@click.option("--output-directory", prompt="Output directory")
@click.option("--seed", default=0)
@click.option("--f0-extractor", default="",
              type=click.Choice(["", "crepe", "yin", "pyin"]),
              help="Override the gin-configured f0 extractor")
@click.option("--crepe-weights", default="", help="Path to a torchcrepe .pth weight file")
def main(gin_file, gin_binding, data_directory, output_directory, seed,
         f0_extractor, crepe_weights):
    for f in gin_file:
        gin.parse_config_file(f)
    for b in gin_binding:
        gin.parse_config(b)
    gin.validate_config()
    select_f0_extractor(f0_extractor)
    if crepe_weights:
        # bind directly (string interpolation into gin syntax would break
        # on paths containing quotes)
        gin.bind_parameter("extract_f0_with_crepe.weights_path", crepe_weights)

    seed_all(seed)

    files = [
        os.path.join(data_directory, f)
        for f in sorted(os.listdir(data_directory))
        if f.lower().endswith(".wav")
    ]
    if not files:
        raise click.ClickException(f"no wav files in {data_directory}")
    print(f"[create_dataset] {len(files)} files -> {output_directory}")
    create_dataset(files, output_directory)


if __name__ == "__main__":
    main()
