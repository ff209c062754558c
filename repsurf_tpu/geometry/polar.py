"""Coordinate transforms (spherical / cylindrical).

TPU re-implementation of classification/modules/polar_utils.py:10-54 (the
segmentation twin is mathematically identical).  NaN guards are done with
``jnp.where`` on *safe inputs* so gradients stay finite (JAX's where-grad
rule would otherwise poison gradients through a NaN branch).
"""

import jax.numpy as jnp

_PI = jnp.pi


def xyz2sphere(xyz, normalize=True):
    """XYZ -> (rho, theta, phi).

    theta in [0, pi] (angle from +z), phi in [-pi, pi]; when ``normalize``,
    theta -> theta/pi in [0,1] and phi -> phi/(2 pi) + 0.5 in [0,1].
    rho == 0 yields theta = 0 (reference NaN guard, polar_utils.py:24-25).

    Args:
      xyz: [..., 3].
    Returns:
      [..., 3] spherical coordinates.
    """
    # every nonlinearity is computed on guarded inputs so gradients stay
    # finite at the degenerate points (sqrt at 0, acos at +-1, atan2 at the
    # origin) — the reference's backward is inf/NaN-poisoned there
    s = jnp.sum(jnp.square(xyz), axis=-1, keepdims=True)
    zero = s == 0.0
    rho = jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, s)))
    u = jnp.clip(xyz[..., 2:3] / jnp.where(zero, 1.0, rho), -1.0, 1.0)
    at_pole = jnp.abs(u) >= 1.0
    theta = jnp.arccos(jnp.where(at_pole, 0.0, u))
    theta = jnp.where(at_pole, jnp.where(u > 0, 0.0, jnp.pi), theta)
    theta = jnp.where(zero, 0.0, theta)  # [0, pi]; 0 at rho == 0
    x, y = xyz[..., 0:1], xyz[..., 1:2]
    xy_zero = (x == 0.0) & (y == 0.0)
    phi = jnp.arctan2(y, jnp.where(xy_zero, 1.0, x))  # atan2(0,0) -> 0
    if normalize:
        theta = theta / _PI
        phi = phi / (2 * _PI) + 0.5
    return jnp.concatenate([rho, theta, phi], axis=-1)


def xyz2cylind(xyz, normalize=True):
    """XYZ -> (rho_xy, phi, z); mirrors polar_utils.py:34-54 (unused by the
    reference models but part of the library surface)."""
    rho = jnp.sqrt(jnp.sum(jnp.square(xyz[..., :2]), axis=-1, keepdims=True))
    rho = jnp.clip(rho, 0.0, 1.0)
    phi = jnp.arctan2(xyz[..., 1:2], xyz[..., 0:1])
    z = jnp.clip(xyz[..., 2:3], -1.0, 1.0)
    if normalize:
        phi = phi / (2 * _PI) + 0.5
        z = (z + 1.0) / 2.0
    return jnp.concatenate([rho, phi, z], axis=-1)
