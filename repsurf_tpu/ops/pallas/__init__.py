"""Pallas TPU kernels for the hot point ops (the counterpart of the
reference's CUDA kernel layer, SURVEY.md §2a/2b L1)."""

from .fps import fps_pallas

__all__ = ["fps_pallas"]
