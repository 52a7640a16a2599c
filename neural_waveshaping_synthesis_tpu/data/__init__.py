"""Data pipeline: shard-format-compatible loading + TPU-batched
offline preprocessing."""
from .general import GeneralDataset, GeneralDataModule
from .urmp import URMPDataModule, URMP_INSTRUMENTS

__all__ = [
    "GeneralDataset",
    "GeneralDataModule",
    "URMPDataModule",
    "URMP_INSTRUMENTS",
]
