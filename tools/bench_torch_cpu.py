#!/usr/bin/env python3
"""Same-host CPU throughput: PyTorch reference vs this framework.

The reference publishes no throughput numbers, so bench.py's A100 constant
is an estimate (BASELINE.md caveats).  The strongest anchor available in
this environment is an apples-to-apples CPU comparison on identical
hardware: the reference classification pipeline is CPU-runnable by design
(its pure-torch op twins, classification/modules/pointnet2_utils.py:15-124,
cuda_ops=False), and our pipeline runs on the CPU backend.  The printed
ratio measures pipeline efficiency independent of accelerator marketing
numbers; the absolute torch-CPU figure also lets a future operator scale
the A100 placeholder once any single torch-GPU measurement exists
(clouds/sec scales with the op mix, not the host).

Prints one JSON line:
  {"torch_cpu": c1, "ours_cpu": c2, "ratio": c2/c1, "batch": B, "num_point": N}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 8
NUM_POINT = 512
ITERS = 5


def bench_torch():
    import numpy as np
    import torch

    from tests import torch_ref
    from tests.test_reference_parity import _cls_args

    if not torch_ref.reference_available():
        return None
    mods = torch_ref.load_tree("classification")
    torch.manual_seed(0)
    model = mods["model_umb"].Model(_cls_args(NUM_POINT))
    model.eval()
    rng = np.random.RandomState(0)
    pts = torch.from_numpy(
        rng.randn(BATCH, 3, NUM_POINT).astype(np.float32)
    )
    with torch.no_grad():
        model(pts)  # warmup
        t0 = time.perf_counter()
        for _ in range(ITERS):
            model(pts)
        dt = (time.perf_counter() - t0) / ITERS
    return BATCH / dt


def bench_ours():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    from repsurf_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from repsurf_tpu.train.train_cls import ClsConfig, create_state

    cfg = ClsConfig(num_point=NUM_POINT)
    state = create_state(cfg, key=jax.random.PRNGKey(0))

    @jax.jit
    def forward(params, batch_stats, points):
        return state.apply_fn(
            {"params": params, "batch_stats": batch_stats}, points, train=False
        )

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(BATCH, NUM_POINT, 3).astype(np.float32))
    np.asarray(forward(state.params, state.batch_stats, pts))  # compile
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = forward(state.params, state.batch_stats, pts)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    return BATCH / dt


def main():
    torch_cps = bench_torch()
    ours_cps = bench_ours()
    print(
        json.dumps(
            {
                "torch_cpu_clouds_per_sec": round(torch_cps, 2) if torch_cps else None,
                "ours_cpu_clouds_per_sec": round(ours_cps, 2),
                "ratio": round(ours_cps / torch_cps, 3) if torch_cps else None,
                "batch": BATCH,
                "num_point": NUM_POINT,
            }
        )
    )


if __name__ == "__main__":
    main()
