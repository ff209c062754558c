"""Utilities: logging, metering, profiling, seeding."""

from .logging import AverageMeter, ScalarWriter, StepTimer, get_logger, profile_trace
from .platform import honor_platform_env
from .seed import set_seed, worker_rng

__all__ = [
    "AverageMeter",
    "ScalarWriter",
    "StepTimer",
    "get_logger",
    "profile_trace",
    "set_seed",
    "worker_rng",
]
