"""Fused ball-group Pallas kernel vs the XLA route (interpret mode).

The kernel must be BIT-identical to ops.neighbors.ball_group — i.e. to
index_points(t, ball_query(...)) — including the reference's quirk
semantics: first-nsample-in-index-order, first-hit padding, empty-ball
idx 0 (classification/modules/pointops/src/ballquery/
ballquery_cuda_kernel.cu:47-80).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repsurf_tpu.ops.gather import index_points
from repsurf_tpu.ops.neighbors import ball_query
from repsurf_tpu.ops.pallas.ball_group import (
    _slot_onehot_xla,
    ball_group_pallas,
)


@pytest.mark.parametrize(
    "radius,nsample,n,m",
    [(0.3, 8, 96, 40), (0.15, 4, 130, 130), (0.6, 16, 64, 16)],
)
def test_matches_two_pass(rng, radius, nsample, n, m):
    xyz = jnp.asarray(rng.randn(3, n, 3).astype(np.float32) * 0.5)
    q = xyz[:, :m]
    feat = jnp.asarray(rng.randn(3, n, 7).astype(np.float32))
    out = ball_group_pallas(
        radius, nsample, xyz, q, (xyz, feat), interpret=True
    )
    idx = ball_query(radius, nsample, xyz, q)
    np.testing.assert_array_equal(
        np.asarray(out[0]), np.asarray(index_points(xyz, idx))
    )
    np.testing.assert_array_equal(
        np.asarray(out[1]), np.asarray(index_points(feat, idx))
    )


def test_valid_mask_and_none_passthrough(rng):
    xyz = jnp.asarray(rng.randn(4, 80, 3).astype(np.float32) * 0.5)
    q = xyz[:, :30]
    valid = jnp.asarray([80, 51, 12, 1], jnp.int32)
    out = ball_group_pallas(
        0.4, 6, xyz, q, (xyz, None), valid=valid, interpret=True
    )
    assert out[1] is None
    idx = ball_query(0.4, 6, xyz, q, valid=valid)
    np.testing.assert_array_equal(
        np.asarray(out[0]), np.asarray(index_points(xyz, idx))
    )


def test_empty_ball_gathers_point0(rng):
    # push queries far away so every ball is empty
    xyz = jnp.asarray(rng.randn(2, 40, 3).astype(np.float32) * 0.1)
    q = xyz[:, :10] + 100.0
    out = ball_group_pallas(0.2, 5, xyz, q, (xyz,), interpret=True)
    expect = jnp.broadcast_to(xyz[:, :1, None, :], (2, 10, 5, 3))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(expect))


def test_backward_matches_xla_route(rng):
    """The custom_vjp cotangent must equal the XLA route's autodiff."""
    from repsurf_tpu.ops.neighbors import ball_group

    xyz = jnp.asarray(rng.randn(2, 60, 3).astype(np.float32) * 0.5)
    q = xyz[:, :20]
    feat = jnp.asarray(rng.randn(2, 60, 5).astype(np.float32))

    def loss_xla(f):
        (g,) = ball_group(0.4, 6, xyz, q, (f,))
        return jnp.sum(g * jnp.cos(g))

    g_xla = jax.grad(loss_xla)(feat)

    # same cotangent contraction via the kernel's backward twin
    onehot = _slot_onehot_xla(0.4, 6, xyz, q, None)
    (grp,) = ball_group(0.4, 6, xyz, q, (feat,))
    cot = jnp.cos(grp) - grp * jnp.sin(grp)
    g_kernel = jnp.einsum(
        "bmsn,bmsc->bnc", onehot, cot, preferred_element_type=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(g_xla), np.asarray(g_kernel), rtol=1e-6, atol=1e-6
    )


class TestBallGroupFeature:
    """Split-output feature kernel (pos planar-transposed + feat channel-
    minor) vs the composed XLA chain."""

    def _refs(self, rng, B=2, N=100, M=30, S=8):
        xyz = (rng.rand(B, N, 3).astype(np.float32) * 2 - 1)
        q = xyz[:, :M].copy()
        normal = rng.randn(B, N, 5).astype(np.float32)
        feat = rng.randn(B, N, 7).astype(np.float32)
        valid = np.asarray([N, max(4, N // 2)][:B], np.int32)
        return xyz, q, normal, feat, valid

    @pytest.mark.parametrize("cf", [5, 60])  # routes: t-kernel / split kernel
    def test_matches_xla_chain(self, rng, cf):
        from repsurf_tpu.geometry.polar import xyz2sphere
        from repsurf_tpu.ops.neighbors import ball_group
        from repsurf_tpu.ops.pallas.ball_group import ball_group_feature_pallas

        xyz, q, _, feat, valid = self._refs(rng)
        normal = rng.randn(*xyz.shape[:2], cf).astype(np.float32)
        for rp in (False, True):
            pos, ft = ball_group_feature_pallas(
                0.3, 8, xyz, q, (xyz, normal, feat), valid=valid,
                return_polar=rp, interpret=True,
            )
            gc, gn, gf = ball_group(
                0.3, 8, xyz, q, (xyz, normal, feat), valid=valid
            )
            rel = np.asarray(gc) - q[:, :, None]
            ref_pos = (
                np.concatenate([rel, np.asarray(xyz2sphere(jnp.asarray(rel)))], -1)
                if rp
                else rel
            )
            ref_ft = np.concatenate([np.asarray(gn), np.asarray(gf)], -1)
            # rel/feat channels are exact; polar goes through acos/atan2
            # whose FMA contraction differs by ~1 ULP between paths
            np.testing.assert_allclose(np.asarray(pos), ref_pos, atol=2e-6, rtol=0)
            np.testing.assert_array_equal(np.asarray(ft), ref_ft)

    def test_empty_balls(self, rng):
        from repsurf_tpu.ops.pallas.ball_group import ball_group_feature_pallas

        xyz = jnp.asarray(rng.randn(2, 40, 3).astype(np.float32) * 0.1)
        q = np.asarray(xyz)[:, :10] + 100.0
        pos, ft = ball_group_feature_pallas(
            0.2, 5, xyz, q, (xyz, xyz), return_polar=False, interpret=True
        )
        rel = np.asarray(xyz)[:, :1, None, :] - q[:, :, None, :]
        np.testing.assert_allclose(
            np.asarray(pos), rel.repeat(5, 2), rtol=1e-6, atol=1e-4
        )

    def test_backward_matches_xla_route(self, rng):
        """d(loss)/d(channel tensors) must equal the XLA route's autodiff
        (pos outputs are data-only: no cotangent flows through them)."""
        import repsurf_tpu.ops.pallas.ball_group as bg
        from repsurf_tpu.geometry.polar import xyz2sphere
        from repsurf_tpu.ops.neighbors import ball_group

        xyz, q, normal, feat, valid = self._refs(rng)
        xyz_j = jnp.asarray(xyz)
        q_j = jnp.asarray(q)
        valid_j = jnp.asarray(valid)

        def loss_fused(nrm, ft):
            cat = jnp.concatenate([xyz_j, nrm, ft], -1)
            pos, f = bg._ball_feat_ad(
                0.3, 8, True, jnp.float32, xyz_j, q_j, cat, valid_j
            )
            return jnp.sum(f * jnp.cos(f)) + jnp.sum(pos) * 0.0

        def loss_xla(nrm, ft):
            gc, gn, gf = ball_group(
                0.3, 8, xyz_j, q_j, (xyz_j, nrm, ft), valid=valid_j
            )
            f = jnp.concatenate([gn, gf], -1)
            return jnp.sum(f * jnp.cos(f))

        gn_f, gf_f = jax.grad(loss_fused, argnums=(0, 1))(
            jnp.asarray(normal), jnp.asarray(feat)
        )
        gn_x, gf_x = jax.grad(loss_xla, argnums=(0, 1))(
            jnp.asarray(normal), jnp.asarray(feat)
        )
        np.testing.assert_allclose(np.asarray(gn_f), np.asarray(gn_x), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gf_f), np.asarray(gf_x), rtol=1e-6, atol=1e-6)
