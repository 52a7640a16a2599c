"""Training runtime: loss, optimizer/schedule, data-parallel trainer,
checkpointing, logging — the layer PL provides for the reference."""
from .loss import multi_resolution_stft_loss, stft_loss
from .trainer import (
    TrainConfig,
    Trainer,
    compute_loss,
    init_train_state,
    make_eval_step,
    make_batch_gather,
    make_multi_train_step,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    select_eval_step,
    train_state_from_params,
)
from .logging import ConsoleLogger, CSVLogger, WandbLogger

__all__ = [
    "multi_resolution_stft_loss",
    "stft_loss",
    "TrainConfig",
    "Trainer",
    "compute_loss",
    "init_train_state",
    "make_eval_step",
    "make_batch_gather",
    "make_multi_train_step",
    "make_lr_schedule",
    "make_optimizer",
    "make_train_step",
    "select_eval_step",
    "train_state_from_params",
    "ConsoleLogger",
    "CSVLogger",
    "WandbLogger",
]
