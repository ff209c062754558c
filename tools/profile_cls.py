"""Stage-level timing of the classification forward on the current backend.

Measurement rules for the axon remote-TPU tunnel:
  * block_until_ready() is async — sync via host readback;
  * readback costs ~32 ms fixed + transfer time, so every timed function is
    reduced to a SCALAR before readback;
  * per-call timing still includes the fixed roundtrip; the pipelined loop
    (N dispatches in flight, one final readback) gives true steady-state
    device time per batch.

Run on TPU: python tools/profile_cls.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from repsurf_tpu.data.transforms import fps_sample
from repsurf_tpu.geometry.umbrella import group_by_umbrella
from repsurf_tpu.nn.blocks import SurfaceAbstractionCD, UmbrellaSurfaceConstructor
from repsurf_tpu.train.train_cls import ClsConfig, create_state


def _scalarize(out):
    leaves = [
        x.astype(jnp.float32).sum()
        for x in jax.tree_util.tree_leaves(out)
        if hasattr(x, "dtype")
    ]
    return sum(leaves)


def timed(fn, *args, n=10, label=""):
    f = jax.jit(lambda *a: _scalarize(fn(*a)))
    np.asarray(f(*args))  # warmup/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"{label:36s} {ms:8.2f} ms")
    return ms


def pipelined(fn, *args, n=30, label=""):
    f = jax.jit(lambda *a: _scalarize(fn(*a)))
    np.asarray(f(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = f(*args)
    np.asarray(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:36s} {ms:8.2f} ms  (pipelined x{n})")
    return ms


def main_ops(n_iters=20, top=40):
    """Per-op xplane profile of the FULL eval pipeline (the bench.py metric).

    Stage stopwatching under the tunnel misled two rounds (see ROADMAP); this
    is the per-op device view that found the round-3 conversion-fusion tax,
    now available for the classification path too (the seg twin lives in
    tools/profile_seg.py and shares its aggregation code).
    """
    from profile_seg import trace  # same dir; xplane aggregation utilities

    batch, n_raw = 64, 2048
    cfg = ClsConfig()
    state = create_state(cfg, key=jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    points = jnp.asarray(rng.randn(batch, n_raw, 3).astype(np.float32))
    v = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def full(points):
        pts = fps_sample(points, cfg.num_point)
        out = state.apply_fn(v, pts, train=False)
        return out.sum()

    np.asarray(full(points))
    t0 = time.perf_counter()
    out = None
    for _ in range(40):
        out = full(points)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / 40
    print(f"full pipeline: {dt * 1e3:.2f} ms = {batch / dt:.0f} clouds/sec")
    trace(lambda: full(points), n_iters, top, "cls eval pipeline")


def main():
    batch, n_raw = 64, 2048
    cfg = ClsConfig()
    state = create_state(cfg, key=jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    points = jnp.asarray(rng.randn(batch, n_raw, 3).astype(np.float32))
    v = {"params": state.params, "batch_stats": state.batch_stats}

    print(f"backend={jax.default_backend()} batch={batch}")

    noop = timed(lambda x: x[0, 0, 0], points, label="tunnel baseline (scalar readback)")

    def full(points):
        pts = fps_sample(points, cfg.num_point)
        return state.apply_fn(v, pts, train=False)

    timed(full, points, label="full pipeline (per-call)")
    pipelined(full, points, label="full pipeline")

    fps_fn = lambda p: fps_sample(p, cfg.num_point)
    pipelined(fps_fn, points, label="fps 2048->1024")
    pts = jax.jit(fps_fn)(points)

    pipelined(
        lambda x: state.apply_fn(v, x, train=False), pts, label="model forward"
    )

    umb = UmbrellaSurfaceConstructor(
        k=9, in_channel=10, style="cls", aggr_type="sum", return_dist=True
    )
    uvars = umb.init({"params": jax.random.PRNGKey(0)}, pts, train=False)
    pipelined(
        lambda x: umb.apply(uvars, x, train=False), pts, label="umbrella constructor"
    )
    from repsurf_tpu.ops.pallas.umbrella import umbrella_features_pallas

    pipelined(
        lambda x: umbrella_features_pallas(x, 9, drop_self=True, style="cls"),
        pts,
        label="  umbrella kernel (fused pallas)",
    )
    feat_u = jax.jit(
        lambda x: umbrella_features_pallas(x, 9, drop_self=True, style="cls")
    )(pts)

    def umb_mlp(feat):
        """The constructor minus the geometry kernel: MLP+BN chain on
        [B, N, G, 10] + fan aggregation (isolates the lane-padded tail)."""
        import flax.linen as fnn

        class Tail(fnn.Module):
            @fnn.compact
            def __call__(self, f):
                from repsurf_tpu.nn.layers import Linear, MaskedBatchNorm

                x = jax.nn.relu(
                    MaskedBatchNorm()(
                        Linear(10, use_bias=False)(f), use_running_average=True
                    )
                )
                x = jax.nn.relu(
                    MaskedBatchNorm()(Linear(10)(x), use_running_average=True)
                )
                x = Linear(10)(x)
                return jnp.sum(x, axis=2)

        tail = Tail()
        tv = tail.init(jax.random.PRNGKey(0), feat)
        return tail, tv

    tail, tv = umb_mlp(feat_u)
    pipelined(
        lambda f: tail.apply(tv, f), feat_u, label="  umbrella MLP tail [B,N,8,10]"
    )
    pipelined(
        lambda x: group_by_umbrella(x, x, k=9, drop_self=True),
        pts,
        label="  group_by_umbrella (knn+sort)",
    )
    from repsurf_tpu.ops.neighbors import knn

    pipelined(lambda x: knn(9, x, x)[0], pts, label="    knn k=9 (pallas)")

    normal = jax.jit(lambda x: umb.apply(uvars, x, train=False))(pts)

    sa1 = SurfaceAbstractionCD(
        npoint=512, radius=0.2, nsample=32, pos_channel=6,
        mlp=(64, 64, 128), grouping="ball", return_polar=True,
    )
    s1v = jax.jit(
        lambda: sa1.init({"params": jax.random.PRNGKey(0)}, pts, normal, None, train=False)
    )()  # jitted: eager init materializes unfused grouping intermediates (OOM)
    pipelined(
        lambda c, n: sa1.apply(s1v, c, n, None, train=False),
        pts, normal, label="sa1 (512, ball .2, k32)",
    )

    # -- sa1 internals -------------------------------------------------------
    from repsurf_tpu.ops.gather import index_points
    from repsurf_tpu.ops.neighbors import ball_group
    from repsurf_tpu.ops.sampling import farthest_point_sample

    pipelined(
        lambda c: farthest_point_sample(c, 512), pts, label="  sa1 fps 1024->512"
    )
    nc = jax.jit(lambda c: index_points(c, farthest_point_sample(c, 512)))(pts)
    pipelined(
        lambda c, q, n: ball_group(0.2, 32, c, q, (c, n, None))[:2],
        pts, nc, normal, label="  sa1 ball_group (fused)",
    )

    def sa1_mlp(gc, gn):
        """sa1 minus sampling/grouping: polar + CD first layer + MLP + max."""
        from repsurf_tpu.geometry.polar import xyz2sphere
        from repsurf_tpu.nn.blocks import SharedMLP
        from repsurf_tpu.nn.layers import Linear, MaskedBatchNorm
        import flax.linen as fnn

        class Tail(fnn.Module):
            @fnn.compact
            def __call__(self, gc, gn):
                g = jnp.concatenate([gc, xyz2sphere(gc)], axis=-1)
                loc = MaskedBatchNorm()(
                    Linear(64)(g), use_running_average=True
                )
                fea = MaskedBatchNorm()(
                    Linear(64)(gn), use_running_average=True
                )
                x = jax.nn.relu(loc + fea)
                x = SharedMLP((64, 128))(x, train=False)
                return jnp.max(x, axis=2)

        t = Tail()
        return t, t.init(jax.random.PRNGKey(0), gc, gn)

    gc1, gn1 = jax.jit(
        lambda c, q, n: ball_group(0.2, 32, c, q, (c, n, None))[:2]
    )(pts, nc, normal)
    gc1 = gc1 - nc[:, :, None]
    t1, t1v = sa1_mlp(gc1, gn1)
    pipelined(
        lambda a, b: t1.apply(t1v, a, b), gc1, gn1,
        label="  sa1 CD-MLP tail [64,512,32,.]",
    )

    c1, n1, f1, _ = jax.jit(lambda c, n: sa1.apply(s1v, c, n, None, train=False))(
        pts, normal
    )
    sa2 = SurfaceAbstractionCD(
        npoint=128, radius=0.4, nsample=64, pos_channel=6,
        mlp=(128, 128, 256), grouping="ball", return_polar=True,
    )
    s2v = jax.jit(
        lambda: sa2.init({"params": jax.random.PRNGKey(0)}, c1, n1, f1, train=False)
    )()
    pipelined(
        lambda c, n, f: sa2.apply(s2v, c, n, f, train=False),
        c1, n1, f1, label="sa2 (128, ball .4, k64)",
    )

    c2, n2, f2, _ = jax.jit(lambda c, n, f: sa2.apply(s2v, c, n, f, train=False))(
        c1, n1, f1
    )
    sa3 = SurfaceAbstractionCD(
        pos_channel=6, mlp=(256, 512, 1024), group_all=True, npoint=1,
        return_polar=True,
    )
    s3v = jax.jit(
        lambda: sa3.init({"params": jax.random.PRNGKey(0)}, c2, n2, f2, train=False)
    )()
    pipelined(
        lambda c, n, f: sa3.apply(s3v, c, n, f, train=False),
        c2, n2, f2, label="sa3 (group_all, mlp->1024)",
    )


if __name__ == "__main__":
    if "--ops" in sys.argv:
        main_ops()
    else:
        main()
