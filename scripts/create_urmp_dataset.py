"""Build per-instrument datasets from a URMP corpus
(reference scripts/create_urmp_dataset.py:35-54): finds each
instrument's separated stems (``AuSep*_<ins>_*.wav``) and writes one
dataset directory per instrument code."""
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
    """Per-instrument stem discovery by FILENAME only. The reference
    additionally filters the directory name (``*_<ins>_*``), which
    misses pieces whose folder name ENDS with the instrument code
    (``01_Jupiter_vn_vc`` has no ``_vc_``); the AuSep filename already
    identifies the instrument precisely, so the directory filter only
    loses files."""
    return sorted(
        str(f) for f in Path(directory).glob(f"**/AuSep*_{instrument}_*.wav")
    )


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
    gin.validate_config()
    select_f0_extractor(f0_extractor)
    if crepe_weights:
        # bind directly (string interpolation into gin syntax would break
        # on paths containing quotes)
        gin.bind_parameter("extract_f0_with_crepe.weights_path", crepe_weights)

    seed_all(seed)

    for instrument in instruments.split(","):
        files = get_instrument_file_list(instrument, data_directory)
        print(f"[create_urmp_dataset] {instrument}: {len(files)} files")
        if files:
            create_dataset(files, os.path.join(output_directory, instrument))


if __name__ == "__main__":
    main()
