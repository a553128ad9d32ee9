"""Experiment loggers (parity surface: reference src/data/loggers/)."""

from lmms_owc_tpu.loggers._wandb import WandbLogger

__all__ = ["WandbLogger"]
