"""Transcendentals missing from the Mosaic TPU lowering (atan2, acos).

Mosaic (Pallas TPU) has no lowering for `atan2` / `acos` as of jax 0.9, so
kernels that need azimuth/inclination angles (ops/pallas/umbrella.py)
implement them on the VPU from primitives it does lower (add/mul/div/sqrt/
select).  The reduction + polynomial follow the classic Cephes ``atanf``
scheme (float32 minimax, ~1-2 ULP): reduce to t in [0, 1] by quotient of
|min|/|max|, fold [tan(pi/8), 1] onto [-0.414, 0] via (t-1)/(t+1), evaluate a
degree-9 odd polynomial, then undo the folds and fix the quadrant.

Accuracy note: these match libm/XLA atan2/acos to ~2 ULP, not bitwise —
fine for feature values, and sort orders derived from them can only flip for
angle pairs closer than the approximation error (measured against the XLA
twins in tests with tolerance 2e-6).

IEEE -0.0 caveat: atan2(-0.0, x<0) returns +pi here (libm returns -pi);
the sign test is `y < 0`, which -0.0 fails.  Upstream umbrella code never
distinguishes the two branches for real data.
"""

import jax.numpy as jnp

_PI = float(jnp.pi)
_PI_2 = _PI / 2.0
_PI_4 = _PI / 4.0
# tan(pi/8): fold threshold
_TAN_PI_8 = 0.4142135623730951


def _atan_poly(z):
    """Cephes atanf core polynomial on |z| <= tan(pi/8)."""
    z2 = z * z
    p = 8.05374449538e-2
    p = p * z2 - 1.38776856032e-1
    p = p * z2 + 1.99777106478e-1
    p = p * z2 - 3.33329491539e-1
    return p * z2 * z + z


def atan_01(t):
    """arctan for t in [0, 1]."""
    fold = t > _TAN_PI_8
    z = jnp.where(fold, (t - 1.0) / (t + 1.0), t)
    a = _atan_poly(z)
    return jnp.where(fold, _PI_4 + a, a)


def atan2(y, x):
    """Four-quadrant arctangent, elementwise, Mosaic-lowerable.

    Matches jnp.arctan2 to ~2 ULP for finite inputs; (0, 0) -> 0.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.where(hi == 0.0, 1.0, hi)
    a = atan_01(t)
    a = jnp.where(ay > ax, _PI_2 - a, a)
    a = jnp.where(x < 0.0, _PI - a, a)
    return jnp.where(y < 0.0, -a, a)


def acos(u):
    """Inverse cosine for u in [-1, 1], Mosaic-lowerable.

    Computed as atan2(sqrt((1+u)(1-u)), u) — the (1+u)(1-u) form keeps
    accuracy near the poles (1-u is exact by Sterbenz there).
    """
    s = jnp.sqrt(jnp.maximum((1.0 + u) * (1.0 - u), 0.0))
    return atan2(s, u)
