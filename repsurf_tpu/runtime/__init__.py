"""Native runtime: C++ shared-memory array arena + prefetching loader
(the TPU-framework counterpart of the reference's SharedArray /dev/shm store
and torch DataLoader worker pool — SURVEY.md §2f data layer)."""

from . import shm
from .loader import PrefetchLoader

__all__ = ["PrefetchLoader", "shm"]
