"""Build per-instrument datasets from a URMP corpus
(reference scripts/create_urmp_dataset.py:35-54): globs
``**/*_<ins>_*/AuSep*_<ins>_*.wav`` for each of the 12 instrument codes
and writes one dataset directory per instrument."""
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click

from neural_waveshaping_synthesis_tpu import minigin as gin
from neural_waveshaping_synthesis_tpu.data import URMP_INSTRUMENTS
from neural_waveshaping_synthesis_tpu.data.preprocess import create_dataset
from neural_waveshaping_synthesis_tpu.utils import seed_all

from create_dataset import select_f0_extractor


def get_instrument_file_list(instrument: str, directory: str):
    return [
        str(f)
        for f in Path(directory).glob(
            f"**/*_{instrument}_*/AuSep*_{instrument}_*.wav"
        )
    ]


@click.command()
@click.option("--gin-file", multiple=True, default=("gin/data/urmp_4second_crepe.gin",))
@click.option("--data-directory", prompt="Data directory")
@click.option("--output-directory", prompt="Output directory")
@click.option("--seed", default=0)
@click.option("--instruments", default=",".join(URMP_INSTRUMENTS),
              help="Comma-separated instrument codes to process")
@click.option("--f0-extractor", default="", type=click.Choice(["", "crepe", "yin"]))
@click.option("--crepe-weights", default="")
def main(gin_file, data_directory, output_directory, seed, instruments,
         f0_extractor, crepe_weights):
    for f in gin_file:
        gin.parse_config_file(f)
    select_f0_extractor(f0_extractor)
    if crepe_weights:
        gin.parse_config(
            f"extract_f0_with_crepe.weights_path = '{crepe_weights}'"
        )

    seed_all(seed)

    for instrument in instruments.split(","):
        files = get_instrument_file_list(instrument, data_directory)
        print(f"[create_urmp_dataset] {instrument}: {len(files)} files")
        if files:
            create_dataset(files, os.path.join(output_directory, instrument))


if __name__ == "__main__":
    main()
