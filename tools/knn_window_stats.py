"""Guard-failure diagnostics for the window-kNN kernel at the four seg-model
call sites (batch 2 x 80k synthetic rooms).  Prints, per call, how many
queries fell back and the guard-trigger breakdown — the tuning signal for
grid2d/w_budget/tier sizes.  Under the margin-tightened guard the columns
are: ``kth>margin`` (kth distance exceeded the clamped window margin — a
real exactness fallback), ``overflow`` (candidate window exceeded the DMA
budget), and ``overhang>0`` (queries whose search sphere merely pokes past
the grid edge; these are clamped, NOT necessarily fallbacks).

Run on TPU: python tools/knn_window_stats.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from repsurf_tpu.data.synthetic_scene import synthetic_room
from repsurf_tpu.ops.pallas.knn_window import knn_window
from repsurf_tpu.ops.sampling import farthest_point_sample


def main():
    rng = np.random.RandomState(0)
    b, n = 2, 80000
    xyz = jnp.asarray(
        np.stack([synthetic_room(n, rng=rng) for _ in range(b)])
    )
    print(f"backend={jax.default_backend()}")

    # FPS-subsampled stage clouds (the real query/point distributions)
    t0 = time.perf_counter()
    idx1 = farthest_point_sample(xyz, n // 4)
    q20 = jnp.take_along_axis(xyz, np.asarray(idx1)[..., None], axis=1)
    idx2 = farthest_point_sample(q20, n // 16)
    q5 = jnp.take_along_axis(q20, np.asarray(idx2)[..., None], axis=1)
    np.asarray(q5)
    print(f"fps prep {time.perf_counter() - t0:.1f}s")

    sites = [
        ("umbrella k=9 80k self", 9, xyz, xyz),
        ("sa1 k=32 80k->20k", 32, xyz, q20),
        ("sa2 k=32 20k->5k", 32, q20, q5),
        ("fp1 k=3 20k->80k", 3, q20, xyz),
    ]
    for name, k, pts, qs in sites:
        t0 = time.perf_counter()
        oi, od, stats = knn_window(k, pts, qs, debug_counts=True)
        stats = np.asarray(stats)
        dt = time.perf_counter() - t0
        for bi in range(b):
            n_bad, n_kth, n_ovf, n_out = stats[bi]
            print(
                f"{name:26s} sample {bi}: bad={n_bad:6d} "
                f"(kth>margin {n_kth:6d}, overflow {n_ovf:6d}, "
                f"overhang>0 {n_out:4d}) of {qs.shape[1]}   [{dt:.2f}s incl compile]"
            )


if __name__ == "__main__":
    main()
