"""Training stack: optimizers, checkpointing, task trainers."""

from . import optim, train_cls, train_seg
from .checkpoint import BestCheckpointer

__all__ = ["BestCheckpointer", "optim", "train_cls", "train_seg"]
