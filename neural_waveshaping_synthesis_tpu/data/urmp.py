"""URMP dataset wiring (reference data/urmp.py:8-23 +
scripts/create_urmp_dataset.py:10-32)."""
import os

from .. import minigin as gin
from .general import GeneralDataModule

# The 12 URMP instrument codes the reference preprocesses
# (scripts/create_urmp_dataset.py:10-23).
URMP_INSTRUMENTS = (
    "vn", "va", "vc", "db", "fl", "ob", "cl", "sax", "bn", "tpt", "hn", "tbn",
)


@gin.configurable
class URMPDataModule(GeneralDataModule):
    """Per-instrument datamodule: root/<instrument>/{train,val,test}."""

    def __init__(
        self,
        urmp_root: str,
        instrument: str,
        batch_size: int = 16,
        load_to_memory: bool = True,
    ):
        # keywords, not positions: GeneralDataModule is itself gin-
        # configurable, so a `GeneralDataModule.batch_size` binding
        # arrives as a merged kwarg — a positional batch_size here then
        # collides with it (TypeError: multiple values). Explicit
        # kwargs take precedence over bindings (minigin._merge_bindings),
        # which is the gin semantics we want: the URMP-level value wins.
        super().__init__(
            os.path.join(urmp_root, instrument),
            batch_size=batch_size,
            load_to_memory=load_to_memory,
        )
        self.instrument = instrument
