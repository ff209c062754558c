"""Per-op device profile of the segmentation train step (batch 2 x 80000).

Two measurements:
  1. pipelined wall time of the full jitted train step (the bench.py metric);
  2. an xplane trace of N steps, aggregated per XLA op on the TPU device
     plane — the view that found round 3's conversion-fusion tax.  Stage
     stopwatching under the axon tunnel carries a 0.1-1.5 ms per-dispatch
     host floor; the xplane view has none.

Run on TPU: python tools/profile_seg.py [--steps 6] [--top 40] [--fwd]
  --fwd additionally traces the eval-mode forward so forward vs backward
  cost can be separated by differencing.
"""

import argparse
import glob
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def build_step():
    from repsurf_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()  # the 80k train step compiles once per host
    from repsurf_tpu.data.s3dis import CLASS_WEIGHTS, pad_batch
    from repsurf_tpu.data.synthetic_scene import synthetic_room
    from repsurf_tpu.train.train_seg import SegConfig, create_state, train_step

    n, b = 80000, 2
    cfg = SegConfig(voxel_max=n, batch_size=b)
    state = create_state(cfg, n_points=n, key=jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    samples = [
        (
            synthetic_room(n, rng=rng),
            rng.rand(n, 3).astype(np.float32),
            rng.randint(0, 13, n).astype(np.int64),
        )
        for _ in range(b)
    ]
    batch = {k: jnp.asarray(v) for k, v in pad_batch(samples, n).items()}
    w = jnp.asarray(CLASS_WEIGHTS[5], jnp.float32)
    return cfg, state, batch, w, train_step


def aggregate_xplane(logdir, n_iters):
    """Sum XEvent durations per op on the TPU device plane, / n_iters."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb found under", logdir)
        return {}
    totals = defaultdict(float)
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_names = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name not in ("XLA Ops", "XLA Modules"):
                    continue
                if line.name == "XLA Modules":
                    continue
                for ev in line.events:
                    totals[ev_names.get(ev.metadata_id, "?")] += (
                        ev.duration_ps / 1e9
                    )  # ps -> ms
    return {k: v / n_iters for k, v in totals.items()}


def print_top(per_op, top, label):
    items = sorted(per_op.items(), key=lambda kv: -kv[1])
    total = sum(per_op.values())
    print(f"\n== {label}: {total:.2f} ms/step device time, top {top} ops ==")
    for name, ms in items[:top]:
        if ms < 0.05:
            break
        print(f"  {ms:9.3f} ms  {name[:110]}")


def trace(fn_call, n_iters, top, label):
    logdir = tempfile.mkdtemp(prefix="segprof_")
    out = fn_call()  # one untraced iteration to settle caches
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    jax.profiler.start_trace(logdir)
    for _ in range(n_iters):
        out = fn_call()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    jax.profiler.stop_trace()
    per_op = aggregate_xplane(logdir, n_iters)
    print_top(per_op, top, label)
    return per_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--fwd", action="store_true")
    args = ap.parse_args()

    cfg, state, batch, w, train_step = build_step()
    print(f"backend={jax.default_backend()}")

    holder = {"state": state}

    def one_step():
        s, loss, ious = train_step(
            holder["state"], batch, w, jax.random.PRNGKey(3), cfg
        )
        holder["state"] = s
        return loss

    # compile + pipelined wall timing
    t0 = time.perf_counter()
    np.asarray(one_step())
    print(f"compile+first step: {time.perf_counter() - t0:.1f} s")
    for trial in range(2):
        t0 = time.perf_counter()
        loss = None
        for _ in range(args.steps):
            loss = one_step()
        np.asarray(loss)
        dt = (time.perf_counter() - t0) / args.steps
        print(
            f"train step (pipelined x{args.steps}): {dt * 1e3:.1f} ms "
            f"= {2 / dt:.2f} scenes/sec"
        )

    per_op = trace(one_step, args.steps, args.top, "train step")

    if args.fwd:
        from repsurf_tpu.train.train_seg import eval_step

        def fwd():
            loss, pred, _ = eval_step(holder["state"], batch, w, cfg)
            return loss

        np.asarray(fwd())
        fwd_op = trace(fwd, args.steps, args.top, "eval forward")
        diff = defaultdict(float, per_op)
        for k, v in fwd_op.items():
            diff[k] -= v
        print_top(
            {k: v for k, v in diff.items() if v > 0},
            args.top,
            "train-step minus forward (~backward+opt)",
        )


if __name__ == "__main__":
    main()
