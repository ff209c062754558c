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
