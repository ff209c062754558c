"""repsurf_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
RepSurf-style point-cloud learning.

Re-designs the capabilities of the PyTorch/CUDA reference (hancyran/RepSurf,
CVPR 2022) for TPU hardware: fixed-shape masked point tensors, Pallas/XLA
kernels for sampling and neighbor search, fused umbrella-surface construction,
and `jax.sharding`-based data parallelism.

Layout convention (single canonical layout for both tasks):
    points  : [B, N, C]  float  (channels-last; padded to a static N)
    valid   : [B] int32 number of valid rows per sample (points are packed
              front-first, i.e. rows [0, valid[b]) are real, the rest padding)

The classification pipeline uses full batches (valid == N); the segmentation
pipeline pads variable-size scenes into the same layout.  This replaces the
reference's two incompatible layouts (dense ``[B, C, N]`` tensors in
`classification/` and ragged ``[sum(N), C]`` + offset tensors in
`segmentation/`).
"""

__version__ = "0.1.0"
